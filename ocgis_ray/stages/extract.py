"""HTML -> text extraction as a stateful actor-pool stage.

The graft payload stage mandated by the north star: ``html:binary ->
text:string`` with **byte-identical output per url** across re-runs and
resume (the per-row invariant the driver's correctness gate checks).
There is no reference analog — this is the web-page counterpart of the
reference's unit-conversion / value-normalization maps
(``/root/reference/src/ocgis/variable/base.py:883-917``).

The extractor is a callable CLASS passed to ``map_batches(...,
concurrency=N)`` so the compiled regex and any parser tables are built
once per actor (``__init__``), not once per batch — the pattern the
reference approximates with module-level caches
(``spatial/geom_cabinet.py:32-96``).

Extraction itself is a deterministic pure function (re2 via
``pyarrow.compute.extract_regex`` — vectorized C++, no Python row
loop), so re-execution under Ray's lineage-based retries preserves
byte identity.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PATTERN = r"(?s)<article>(?P<text>.*)</article>"


class HtmlExtractor:
    """Actor-pool stage: adds ``text_extracted`` from ``html``.

    Use: ``ds.map_batches(HtmlExtractor, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.  Batches stay Arrow end to end;
    the html payload is the fat column, so keep ``batch_size`` modest
    (1-4k rows) and project ``html`` away immediately after this stage
    (wide rows must never reach a shuffle — SURVEY §7.5).
    """

    def __init__(self, pattern: str = _PATTERN):
        # once per actor: in a real deployment this would load parser
        # tables / models; here the compiled re2 pattern is the state.
        self.pattern = pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        html_utf8 = pc.cast(batch["html"], pa.string())
        extracted = pc.struct_field(
            pc.extract_regex(html_utf8, self.pattern), "text"
        )
        return batch.append_column("text_extracted", extracted)


def extract(ds, concurrency=None, batch_size: int = 2048):
    """Attach the extraction actor pool to a pages Dataset."""
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def verify_extraction_batch(batch: pa.Table) -> pa.Table:
    """Byte-identity check: ``text_extracted == text`` per row.

    Returns rows that VIOLATE the invariant (empty result == pass);
    used by tests and the flagship pipeline's assert stage."""
    bad = pc.invert(pc.equal(batch["text_extracted"], batch["text"]))
    return batch.filter(pc.fill_null(bad, True))
