"""Web-text quality filtering: Gopher repetition stats, C4 line
cleaning, PII redaction, paragraph dedup — DuckDB-parity + property
tests (stages/quality.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocgis_ray.stages.quality import (
    C4_BLOCKLIST,
    _segments,
    _string_byte_view,
    add_quality_stats,
    c4_line_filter,
    c4_line_filter_sql,
    gopher_filter,
    paragraph_dedup,
    pii_redact,
    pii_redact_sql,
    quality_stats_arrays,
    quality_stats_sql,
)

EDGE_TEXTS = [
    "", " ", "  ", "one", "a b a b a b", "the the the",
    "héllo wörld héllo wörld", None, "a", "x " * 50,
    "the quick brown fox jumps over the lazy dog and runs on",
    "日本 語 日本 語 test", "trailing space ", " leading", "a  b", "ab" * 200,
]


def _edge_table():
    return pa.table({
        "doc_id": list(range(len(EDGE_TEXTS))),
        "text": pa.array(EDGE_TEXTS, type=pa.string()),
    })


# ------------------------------------------------------------- segments

def test_segments_match_str_split():
    texts = ["a b", "", " ", "x", "a  b ", "one two three"]
    arr = pa.array(texts, type=pa.string())
    data, off = _string_byte_view(arr)
    starts, ends, seg_row, per = _segments(data, off, ord(" "))
    got = [[] for _ in texts]
    for s, e, r in zip(starts, ends, seg_row):
        got[r].append(bytes(data[s:e]).decode())
    assert got == [t.split(" ") for t in texts]
    assert per.tolist() == [len(t.split(" ")) for t in texts]


def test_segments_random_property():
    rng = np.random.default_rng(7)
    texts = []
    for _ in range(200):
        n = rng.integers(0, 30)
        texts.append("".join(rng.choice([" ", "a", "b", "cc"], size=n)))
    arr = pa.array(texts, type=pa.string())
    data, off = _string_byte_view(arr)
    starts, ends, seg_row, per = _segments(data, off, ord(" "))
    got = [[] for _ in texts]
    for s, e, r in zip(starts, ends, seg_row):
        got[r].append(bytes(data[s:e]).decode())
    assert got == [t.split(" ") for t in texts]


# --------------------------------------------------- Gopher stats parity

def _assert_stats_match_duckdb(tbl: pa.Table):
    stats = quality_stats_arrays(tbl["text"])
    mask = stats.pop("_null_mask", None)
    eng = pd.DataFrame({"doc_id": tbl["doc_id"].to_numpy(), **stats})
    if mask is not None:
        for c in eng.columns[1:]:
            eng.loc[mask, c] = np.nan
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = con.execute(quality_stats_sql()).fetchdf()
    con.close()
    eng = eng.sort_values("doc_id").reset_index(drop=True)
    ora = ora.sort_values("doc_id").reset_index(drop=True)
    for c in ["dup_word_frac", "mean_word_len", "stopword_frac",
              "top_bigram_frac", "gopher_keep"]:
        a = eng[c].to_numpy(np.float64)
        b = ora[c].to_numpy(np.float64)
        same = (np.isnan(a) & np.isnan(b)) | (a == b)
        assert same.all(), (c, np.nonzero(~same)[0])


def test_quality_stats_edge_cases_bit_exact():
    _assert_stats_match_duckdb(_edge_table())


def test_quality_stats_real_documents_bit_exact():
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    _assert_stats_match_duckdb(tbl)
    # the gate must split, not rubber-stamp
    keep = quality_stats_arrays(tbl["text"])["gopher_keep"]
    assert 0.05 < keep.mean() < 0.95


def test_quality_stats_random_texts_bit_exact():
    rng = np.random.default_rng(11)
    vocab = ["the", "a", "on", "zq", "wordy", "bb", "ccc", "dddd", "ée"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
             for _ in range(300)]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    _assert_stats_match_duckdb(tbl)


def test_add_quality_stats_and_filter(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = add_quality_stats(ds).to_pandas()
    assert {"dup_word_frac", "mean_word_len", "stopword_frac",
            "top_bigram_frac", "gopher_keep"} <= set(out.columns)
    kept = gopher_filter(ds).to_pandas()
    assert len(kept) == int(out["gopher_keep"].sum())
    assert 0 < len(kept) < len(out)


# ------------------------------------------------------- C4 line filter

C4_DOCS = [
    "Good sentence here today.\nshort\nThis line has javascript inside it.\n"
    "Another proper long sentence!",
    "no terminal punctuation at all\nstill none",
    "Only one good line stays right here.",
    "",
    "Has a { brace so it dies here.\nBut this survives just fine?",
    'Quoted line is kept as well."\nlorem ipsum dolor sit amet etc.',
    "Ends with period.\n\nEmpty line above.",
]


def _c4_expected(texts):
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(texts))),
                                "text": pa.array(texts, type=pa.string())}))
    expr = c4_line_filter_sql("text")
    df = con.execute(f"SELECT i, {expr} AS cleaned FROM t ORDER BY i").fetchdf()
    con.close()
    return df


def test_c4_line_filter_matches_duckdb(ray_session):
    import ray.data as rd

    texts = C4_DOCS + [
        " ".join(["Filler words line ending well."] * 3),
        "Tab\there but still ends with a word count of nine total.",
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "i": list(range(len(texts))), "text": texts}))
    got = c4_line_filter(ds, drop_empty_docs=False).to_pandas() \
        .sort_values("i").reset_index(drop=True)
    # DuckDB's array_to_string yields NULL for an empty kept-list where
    # the engine yields '' — normalize that representational difference
    exp = _c4_expected(texts)["cleaned"].fillna("")
    assert got["text"].tolist() == exp.tolist()


def test_c4_drops_empty_docs(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"i": [0, 1], "text": [
        "no punct no keep", "This one is kept fine."]}))
    out = c4_line_filter(ds).to_pandas()
    assert out["i"].tolist() == [1]


def test_c4_blocklist_cannot_match_across_rows(ray_session):
    import ray.data as rd

    # adjacent rows in one buffer: "...lorem" | "ipsum..." must NOT
    # form a blocklist hit spanning the row boundary
    a = "This line would end in lorem"
    b = "ipsum starts here but line is clean and long enough."
    ds = rd.from_pandas(pd.DataFrame({"i": [0, 1], "text": [a + ".", b]}))
    out = c4_line_filter(ds, drop_empty_docs=False).to_pandas() \
        .sort_values("i")
    assert out["text"].tolist() == [a + ".", b]
    assert "lorem ipsum" in C4_BLOCKLIST


# ---------------------------------------------------------- PII redact

PII_DOCS = [
    "contact me at john.doe+spam@example.co.uk or on 555-123-4567 now",
    "server at 192.168.0.1 and also 8.8.8.8.",
    "no pii here at all",
    "mixed a@b.io then +358 555-123-4567 then 10.0.0.255 done",
    "",
]


def test_pii_redact_matches_duckdb(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "i": list(range(len(PII_DOCS))), "text": PII_DOCS}))
    got = pii_redact(ds, concurrency=1).to_pandas() \
        .sort_values("i").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(PII_DOCS))),
                                "text": PII_DOCS}))
    exp = con.execute(
        f"SELECT i, {pii_redact_sql('text')} AS r FROM t ORDER BY i").fetchdf()
    con.close()
    assert got["text"].tolist() == exp["r"].tolist()
    assert "<EMAIL>" in got["text"][0] and "<PHONE>" in got["text"][0]
    assert got["text"][1].count("<IP>") == 2


# ------------------------------------------------------ paragraph dedup

def _para_dedup_local(docs, sep="\n\n"):
    seen = {}
    order = []
    for i, txt in docs:
        for j, p in enumerate(txt.split(sep)):
            key = p
            if key not in seen:
                seen[key] = (i, j)
    out = {}
    for i, txt in docs:
        kept = [p for j, p in enumerate(txt.split(sep))
                if seen[p] == (i, j)]
        if kept:
            out[i] = sep.join(kept)
    return out


def test_paragraph_dedup_matches_local_reference(ray_session):
    import ray.data as rd

    docs = [
        (0, "alpha\n\nbeta\n\ngamma"),
        (1, "beta\n\ndelta"),          # beta deduped (doc 0 owns it)
        (2, "alpha\n\nbeta"),          # everything deduped -> dropped
        (3, "epsilon"),
        (4, "delta\n\nalpha\n\nzeta"),
    ]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]}))
    got = paragraph_dedup(ds, num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _para_dedup_local(docs)
    assert dict(zip(got["doc_id"], got["text"])) == exp


def test_paragraph_dedup_within_doc_repeats(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [7], "text": ["same\n\nsame\n\nother"]}))
    got = paragraph_dedup(ds, num_buckets=2).to_pandas()
    assert got["text"].tolist() == ["same\n\nother"]


# -------------------------------------------- full Gopher n-gram table

def _ngram_ref(texts, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    """Slow-but-obvious reference for ngram_repetition_arrays."""
    from collections import Counter

    from ocgis_ray.parity import sql_round

    out = {f"top_{n}gram_char_frac": [] for n in top_ns}
    out.update({f"dup_{n}gram_char_frac": [] for n in dup_ns})
    for t in texts:
        if t is None:
            for k in out:
                out[k].append(np.nan)
            continue
        words = t.split(" ")
        nchars = len(t)
        # char start of each word
        wstart, pos = [], 0
        for w in words:
            wstart.append(pos)
            pos += len(w) + 1
        for n in set(top_ns) | set(dup_ns):
            grams = [tuple(words[i:i + n]) for i in range(len(words) - n + 1)]
            cnt = Counter(grams)
            if n in top_ns:
                best = 0.0
                for g, c in cnt.items():
                    glen = sum(len(w) for w in g) + n - 1
                    best = max(best, c * glen)
                v = best / max(nchars, 1) if nchars > 0 else 0.0
                out[f"top_{n}gram_char_frac"].append(float(sql_round(v, 6)))
            if n in dup_ns:
                marked = set()
                for i, g in enumerate(grams):
                    if cnt[g] >= 2:
                        lo = wstart[i]
                        hi = wstart[i + n - 1] + len(words[i + n - 1])
                        marked.update(range(lo, hi))
                v = len(marked) / max(nchars, 1) if nchars > 0 else 0.0
                out[f"dup_{n}gram_char_frac"].append(float(sql_round(v, 6)))
    return {k: np.asarray(v, dtype=np.float64) for k, v in out.items()}


def test_ngram_repetition_matches_reference():
    from ocgis_ray.stages.quality import ngram_repetition_arrays

    rng = np.random.default_rng(23)
    vocab = ["a", "bb", "ccc", "the", "on", "zz", "é日"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 60)))
             for _ in range(300)]
    texts += ["", " ", "a b a b a b a b a b a b", "one two three four five",
              None, "x " * 30, "same same same same same same same same"]
    arr = pa.array(texts, type=pa.string())
    got = ngram_repetition_arrays(arr)
    mask = got.pop("_null_mask", None)
    exp = _ngram_ref(texts)
    for k in exp:
        a = got[k].astype(np.float64).copy()
        if mask is not None:
            a[mask] = np.nan
        b = exp[k]
        same = (np.isnan(a) & np.isnan(b)) | (a == b)
        assert same.all(), (k, np.nonzero(~same)[0][:5],
                            a[~same][:5], b[~same][:5])


def test_ngram_repetition_known_values():
    from ocgis_ray.stages.quality import ngram_repetition_arrays

    # "ab cd ab cd ab" : top bigram ("ab","cd") count 2, len 5 -> 10/14
    from ocgis_ray.parity import sql_round

    got = ngram_repetition_arrays(pa.array(["ab cd ab cd ab"]),
                                  top_ns=(2,), dup_ns=(2,))
    assert got["top_2gram_char_frac"][0] == float(sql_round(10 / 14, 6))
    # dup bigrams: ("ab","cd") x2 and ("cd","ab") x2 -> every char covered
    assert got["dup_2gram_char_frac"][0] == 1.0


def test_add_ngram_repetition_stage(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.quality import add_ngram_repetition

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = add_ngram_repetition(ds).to_pandas()
    assert "top_3gram_char_frac" in out and "dup_10gram_char_frac" in out
    assert ((out["dup_5gram_char_frac"] >= 0) & (out["dup_5gram_char_frac"] <= 1)).all()
    # dup coverage can only shrink as n grows (an n+1-dup implies an n-dup span)
    assert (out["dup_6gram_char_frac"] <= out["dup_5gram_char_frac"] + 1e-12).all()


# ------------------------------------------------- review regressions

def test_sliced_array_window_clamping():
    """Sliced Arrow arrays share the parent buffer: out-of-window
    '://' / blocklist bytes must not be attributed to in-window rows."""
    from ocgis_ray.stages.quality import _find_substring_starts
    from ocgis_ray.stages.url import parse_url_arrays

    full = pa.array(["x://evil{lorem ipsum", "plain", "alpha beta"])
    sliced = full.slice(1, 2)  # window excludes the '://' and '{'
    got = parse_url_arrays(sliced)
    assert got["url_scheme"].to_pylist() == ["plain", "alpha beta"]
    assert got["url_host"].to_pylist() == ["", ""]

    # the byte view is rebased to the slice window, so the '{' in the
    # pre-slice bytes is invisible to the substring scan
    data, off = _string_byte_view(sliced.combine_chunks()
                                  if isinstance(sliced, pa.ChunkedArray) else sliced)
    hits = _find_substring_starts(data, b"{")
    assert len(hits) == 0 and off[0] == 0


def test_quality_stats_on_sliced_array():
    full = pa.array(["pre slice words", "the quick fox runs", "a b a b"])
    sliced = full.slice(1, 2)
    got = quality_stats_arrays(sliced)
    whole = quality_stats_arrays(pa.array(["the quick fox runs", "a b a b"]))
    for k in whole:
        assert np.array_equal(got[k], whole[k]), k


def test_pii_ascii_class_parity(ray_session):
    """Python \\d is Unicode-aware by default; RE2 is ASCII-only — the
    stage must compile with re.ASCII or Arabic-Indic digits diverge."""
    import ray.data as rd

    from ocgis_ray.stages.quality import pii_redact_sql

    texts = ["\u0661\u0662\u0663.\u0661.\u0661.\u0661 stays",
             "real 10.0.0.1 goes", "４５６-７８９-０１２３ fullwidth stays"]
    ds = rd.from_pandas(pd.DataFrame({"i": [0, 1, 2], "text": texts}))
    got = pii_redact(ds, concurrency=1).to_pandas().sort_values("i")
    con = duckdb.connect()
    con.register("t", pa.table({"i": [0, 1, 2], "text": texts}))
    exp = con.execute(
        f"SELECT {pii_redact_sql('text')} AS r FROM t ORDER BY i").fetchdf()
    con.close()
    assert got["text"].tolist() == exp["r"].tolist()
    assert "<IP>" not in got["text"].tolist()[0]
    assert "<IP>" in got["text"].tolist()[1]


def test_paragraph_dedup_keep_empty_docs(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha\n\nbeta", "alpha\n\nbeta", None],
    })
    ds = rd.from_pandas(docs)
    kept = paragraph_dedup(ds, num_buckets=2, drop_empty_docs=False) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 1 fully deduped and doc 2 NULL -> both survive as ''
    assert kept["doc_id"].tolist() == [0, 1, 2]
    assert kept["text"].tolist() == ["alpha\n\nbeta", "", ""]


def test_paragraph_dedup_string_ids(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": ["b", "a"], "text": ["shared\n\nmine", "shared"]}))
    got = paragraph_dedup(ds, num_buckets=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # survivor of "shared" is lexicographic-min id "a"
    assert dict(zip(got["doc_id"], got["text"])) == {
        "a": "shared", "b": "mine"}


def test_gather_strings_int32_guard():
    from ocgis_ray.stages.quality import _gather_strings

    with pytest.raises(ValueError, match="2 GiB"):
        _gather_strings(np.zeros(8, np.uint8),
                        np.zeros(2, np.int64),
                        np.full(2, 1 << 30, np.int64))


def test_c4_sql_twin_custom_terminal(ray_session):
    import ray.data as rd

    texts = ["keep this line;\ndrop this one.", "also kept;"]
    ds = rd.from_pandas(pd.DataFrame({"i": [0, 1], "text": texts}))
    got = c4_line_filter(ds, terminal=b";", drop_empty_docs=False) \
        .to_pandas().sort_values("i")
    con = duckdb.connect()
    con.register("t", pa.table({"i": [0, 1], "text": texts}))
    expr = c4_line_filter_sql("text", terminal=b";")
    exp = con.execute(f"SELECT {expr} AS r FROM t ORDER BY i").fetchdf()
    con.close()
    assert got["text"].tolist() == exp["r"].fillna("").tolist()


# --------------------------------------------------- cleaning pipeline

def test_clean_corpus_end_to_end(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    n0 = docs.count()
    # synthetic docs have no newlines/terminal punct -> skip c4
    steps = ("exact_dedup", "pii", "gopher", "paragraph_dedup", "near_dup")
    out = clean_corpus(docs, steps=steps, num_buckets=4).to_pandas()
    assert 0 < len(out) < n0
    # survivors are unique ids with non-empty text
    assert out["doc_id"].is_unique
    assert (out["text"].str.len() > 0).all()
    # every survivor came from the input unchanged in id space
    src = docs.to_pandas()
    assert set(out["doc_id"]) <= set(src["doc_id"])
    # monotone: the gopher gate alone keeps at least as many docs
    from ocgis_ray.stages.quality import gopher_filter

    assert len(out) <= gopher_filter(docs).count()


def test_clean_corpus_decontam_step(ray_session):
    """The decontam step drops benchmark-overlapping docs inside the
    cascade, and is a no-op when no index is passed."""
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus
    from ocgis_ray.stages.decontam import build_bench_ngrams

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    bench = build_bench_ngrams(
        docs.filter(lambda r: r["doc_id"] < 5), n=8)
    steps = ("decontam", "exact_dedup")
    with_gate = clean_corpus(docs, steps=steps, bench_ngrams=bench,
                             decontam_n=8, num_buckets=4).to_pandas()
    without = clean_corpus(docs, steps=("exact_dedup",),
                           num_buckets=4).to_pandas()
    assert len(with_gate) < len(without)
    # explicitly listing decontam WITHOUT an index is an error now
    # (round-3 advice), not a silent no-op control
    with pytest.raises(ValueError, match="decontam.*bench_ngrams"):
        clean_corpus(docs, steps=steps, num_buckets=4)
    # the benchmark docs themselves are contaminated by construction
    assert not (with_gate["doc_id"] < 5).any()
    assert set(with_gate["doc_id"]) <= set(without["doc_id"])


def test_clean_corpus_substr_step(ray_session):
    """substr_dedup composes in the cascade: duplicated long spans are
    cut, survivors keep unique ids."""
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    base = "different filler sentence number %d with assorted words "
    span = "an exactly repeated long span of text that is well over "\
           "sixty four bytes long for the cutter to find "
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [base % 0 + span, base % 1 + span,
                 base % 2, base % 3],
    })
    out = clean_corpus(rd.from_pandas(df), steps=("substr_dedup",),
                       substr_min_len=64, num_buckets=2).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert span in out.loc[0, "text"]
    assert span not in out.loc[1, "text"]
    assert out.loc[2, "text"] == base % 2


def test_clean_corpus_unknown_step():
    from ocgis_ray.pipelines.cleaning import clean_corpus

    with pytest.raises(ValueError, match="unknown cleaning steps"):
        clean_corpus(None, steps=("gopher", "nope"))


def test_clean_corpus_url_dedup(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    df = pd.DataFrame({
        "doc_id": [2, 1, 3],
        "url": ["https://a.com/x", "https://a.com/x", "https://b.com/y"],
        "text": ["the quick brown fox jumps over and over the lazy dog "
                 "with many more words to pass the gate easily " * 1,
                 "same", "other"],
    })
    out = clean_corpus(rd.from_pandas(df), url_col="url",
                       steps=("url_dedup",), num_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_clean_corpus_partitioned_resume(ray_session, tmp_path):
    import shutil

    from ocgis_ray.pipelines.cleaning import clean_corpus_partitioned
    from ocgis_ray.state.lineage import read_manifest

    out = str(tmp_path / "cleaned")
    rec1 = clean_corpus_partitioned(
        "/root/testdata/sf0.001/documents.parquet", out,
        n_partitions=4, filter_steps=("gopher", "pii"),
        dedup_steps=("exact_dedup",))
    assert len(rec1) == 5  # 4 filter partitions + final
    total = sum(r["rows"] for r in rec1 if r["partition"] == "final")
    assert 0 < total < 500

    # full resume: nothing re-runs
    rec2 = clean_corpus_partitioned(
        "/root/testdata/sf0.001/documents.parquet", out,
        n_partitions=4, filter_steps=("gopher", "pii"),
        dedup_steps=("exact_dedup",))
    assert rec2 == []

    # partial resume: drop one phase-A partition from the manifest and
    # disk; only it (and the final) re-run
    shutil.rmtree(f"{out}/filtered/part=2")
    mp = f"{out}/filtered/manifest.jsonl"
    lines = [l for l in open(mp) if '"partition": "2"' not in l]
    open(mp, "w").writelines(lines)
    mp_out = f"{out}/manifest.jsonl"
    lines = [l for l in open(mp_out) if '"partition": "final"' not in l]
    open(mp_out, "w").writelines(lines)
    rec3 = clean_corpus_partitioned(
        "/root/testdata/sf0.001/documents.parquet", out,
        n_partitions=4, filter_steps=("gopher", "pii"),
        dedup_steps=("exact_dedup",))
    parts = sorted(r["partition"] for r in rec3)
    assert parts == ["2", "final"]
    # final output identical row count after the partial re-run
    total3 = [r["rows"] for r in read_manifest(out) if r["partition"] == "final"][-1]
    assert total3 == total


def test_hash_segments_full_content():
    """Distinct words sharing a >=128-byte prefix must hash apart
    (round-2 prefix cap collided them), and the short-word loop path
    must agree with the long-batch gather path on the same word."""
    from ocgis_ray.stages.quality import _hash_segments

    w1 = b"x" * 200 + b"a"
    w2 = b"x" * 200 + b"b"
    data = np.frombuffer(b"hello" + w1 + w2, dtype=np.uint8)
    starts = np.array([0, 5, 5 + len(w1)], dtype=np.int64)
    lens = np.array([5, len(w1), len(w2)], dtype=np.int64)
    h = _hash_segments(data, starts, lens)  # gather path (lmax > 16)
    assert h[1] != h[2]

    short = _hash_segments(np.frombuffer(b"hello", dtype=np.uint8),
                           np.array([0], dtype=np.int64),
                           np.array([5], dtype=np.int64))  # loop path
    assert short[0] == h[0]


def test_stratified_sample_numeric_group_keys(ray_session):
    """Numeric group keys must emit numeric SQL literals — quoting
    them makes DuckDB compare an int column against VARCHAR."""
    import ray.data as rd

    from ocgis_ray.stages.reshape import (stratified_sample,
                                          stratified_sample_sql_pred)

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64),
                       "grp": (np.arange(2000) % 3).astype(np.int64)})
    rates = {0: 0.5, 1: 0.1}
    kept = stratified_sample(rd.from_pandas(df), "doc_id", "grp",
                             rates, default_rate=0.9).to_pandas()
    pred = stratified_sample_sql_pred("doc_id", "grp", rates,
                                      default_rate=0.9)
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute(f"SELECT * FROM t WHERE {pred}").fetchdf()
    assert sorted(kept["doc_id"]) == sorted(oracle["doc_id"])
    assert len(kept) > 0


def test_clean_corpus_partitioned_pushdown(ray_session, tmp_path, monkeypatch):
    """Phase A pushes each shard's id range down as a parquet scan
    filter (round 2 read the WHOLE input once per partition): every
    phase-A read carries a range filter, and that filter admits
    strictly fewer row groups than the file holds — footer-statistic
    pruning, the reorder-test evidence pattern."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ocgis_ray.pipelines import cleaning
    from ocgis_ray.pipelines.cleaning import clean_corpus_partitioned
    from ocgis_ray.sources import io as io_mod

    # doc_id-sorted copy with small row groups so statistics can prune
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet") \
            .sort_by("doc_id")
    path = str(tmp_path / "docs_sorted.parquet")
    pq.write_table(tbl, path, row_group_size=50)

    seen_filters = []
    orig = io_mod.read_parquet_sized

    def spy(p, *a, **kw):
        if kw.get("filter") is not None:
            seen_filters.append(kw["filter"])
        return orig(p, *a, **kw)

    monkeypatch.setattr(io_mod, "read_parquet_sized", spy)
    # cleaning.py imports the symbol inside the function body from
    # sources.io, so patching the source module intercepts it
    out = str(tmp_path / "cleaned")
    recs = clean_corpus_partitioned(path, out, n_partitions=4,
                                    filter_steps=("gopher",),
                                    dedup_steps=("exact_dedup",))
    assert len(recs) == 5
    assert len(seen_filters) == 4  # one pushed-down range per shard

    frag = list(pads.dataset(path).get_fragments())[0]
    total = frag.num_row_groups
    assert total > 4
    for expr in seen_filters:
        kept = len(list(frag.split_by_row_group(expr)))
        assert kept < total, (kept, total)


def test_clean_corpus_partitioned_all_filtered(ray_session, tmp_path):
    """Every row gated in phase A -> a clear error naming the cause,
    not an opaque read_parquet([]) crash in phase B."""
    import pyarrow.parquet as pq

    from ocgis_ray.pipelines.cleaning import clean_corpus_partitioned

    # texts far below the gopher word floor: everything is filtered
    tbl = pa.table({"doc_id": list(range(20)),
                    "text": ["tiny"] * 20})
    path = str(tmp_path / "docs_tiny.parquet")
    pq.write_table(tbl, path)
    with pytest.raises(ValueError, match="produced no"):
        clean_corpus_partitioned(path, str(tmp_path / "cleaned"),
                                 n_partitions=2, filter_steps=("gopher",),
                                 dedup_steps=("exact_dedup",))


def test_clean_corpus_simhash_near_dup(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the long field of tall green grass today")
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, base + " x", "entirely different content here"],
    })
    out = clean_corpus(rd.from_pandas(df), steps=("near_dup",),
                       near_dup_method="simhash", max_hamming=8,
                       num_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]
    with pytest.raises(ValueError, match="near_dup_method"):
        clean_corpus(None, near_dup_method="nope")


# ------------------------------------- line/paragraph repetition table

def _line_rep_ref(texts):
    from ocgis_ray.parity import sql_round

    out = {k: [] for k in ["dup_line_frac", "dup_line_char_frac",
                           "dup_para_frac", "dup_para_char_frac"]}
    for t in texts:
        if t is None:
            for k in out:
                out[k].append(np.nan)
            continue
        lines = t.split("\n")
        nchars = max(len(t), 1)
        from collections import Counter
        lc = Counter(lines)
        dup_lines = [l for l in lines if lc[l] >= 2]
        out["dup_line_frac"].append(float(sql_round(
            len(dup_lines) / max(len(lines), 1), 6)))
        out["dup_line_char_frac"].append(float(sql_round(
            sum(len(l) for l in dup_lines) / nchars, 6)))
        # paragraphs: maximal runs of non-empty lines
        paras, cur = [], []
        for l in lines:
            if l:
                cur.append(l)
            elif cur:
                paras.append(tuple(cur)); cur = []
        if cur:
            paras.append(tuple(cur))
        pc_ = Counter(paras)
        dups = [p for p in paras if pc_[p] >= 2]
        out["dup_para_frac"].append(float(sql_round(
            len(dups) / max(len(paras), 1), 6)))
        out["dup_para_char_frac"].append(float(sql_round(
            sum(len(l) for p in dups for l in p) / nchars, 6)))
    return {k: np.asarray(v) for k, v in out.items()}


def test_line_repetition_matches_reference():
    from ocgis_ray.stages.quality import line_repetition_arrays

    rng = np.random.default_rng(31)
    pieces = ["aaa", "bb", "line one", "x", "", "Q" * 200 + "tail1", "Q" * 200 + "tail2"]
    texts = ["\n".join(rng.choice(pieces, size=rng.integers(0, 25)))
             for _ in range(300)]
    texts += ["", "\n", "\n\n", "same\nsame", "a\n\na\n\nb", None,
              "p1\np2\n\np1\np2\n\nother", "solo", "é日\né日"]
    arr = pa.array(texts, type=pa.string())
    got = line_repetition_arrays(arr)
    mask = got.pop("_null_mask", None)
    exp = _line_rep_ref(texts)
    for k in exp:
        a = got[k].astype(np.float64).copy()
        if mask is not None:
            a[mask] = np.nan
        b = exp[k]
        same = (np.isnan(a) & np.isnan(b)) | (a == b)
        assert same.all(), (k, np.nonzero(~same)[0][:5], a[~same][:5], b[~same][:5])


def test_add_line_repetition_stage(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.quality import add_line_repetition

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["dup\ndup\nunique", "all\ndistinct\nlines"]}))
    out = add_line_repetition(ds).to_pandas().sort_values("doc_id")
    assert out["dup_line_frac"].tolist()[0] > 0
    assert out["dup_line_frac"].tolist()[1] == 0.0


def test_line_repetition_long_same_prefix_lines():
    """Lines past the word-hash 128-byte cap must still be
    distinguished (full-content hashing)."""
    from ocgis_ray.stages.quality import line_repetition_arrays

    a = "P" * 128 + "AAAA"
    b = "P" * 128 + "BBBB"
    got = line_repetition_arrays(pa.array([a + "\n" + b, a + "\n" + a]))
    assert got["dup_line_frac"][0] == 0.0   # distinct despite shared prefix
    assert got["dup_line_frac"][1] == 1.0   # true duplicates still found


def test_line_repetition_giant_single_paragraph_fast():
    """One blank-line-free 50k-line document must not stall the batch
    (the segmented Horner is O(total lines), not O(max para lines))."""
    import time

    from ocgis_ray.stages.quality import line_repetition_arrays

    giant = "\n".join(f"line {i}" for i in range(50_000))
    texts = [giant] + ["short\ndoc\n\npara two"] * 100
    t0 = time.time()
    got = line_repetition_arrays(pa.array(texts))
    assert time.time() - t0 < 2.0
    assert got["dup_para_frac"][0] == 0.0


def test_clean_corpus_embedding_near_dup(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    n0 = docs.count()
    out = clean_corpus(docs, steps=("near_dup",),
                       near_dup_method="embedding", embeddings=emb,
                       embedding_threshold=0.99, num_buckets=4).to_pandas()
    assert 0 < len(out) <= n0
    assert out["doc_id"].is_unique
    with pytest.raises(ValueError, match="embeddings Dataset"):
        clean_corpus(docs, steps=("near_dup",), near_dup_method="embedding")


def test_clean_corpus_null_urls_through_full_cascade(ray_session):
    """Null urls + url_dedup + downstream bucketed stages: the
    dedup_by_url union mixes map_groups pandas blocks with the
    null-branch blocks, and Ray's batcher asserts on MIXED block
    types when a later stage bundles blocks from both branches
    (regression: the null branch now emits pandas blocks too).
    Survivor semantics checked end to end: url dup, gopher gate,
    content dup, PII rewrite."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus
    from ocgis_ray.stages.quality import quality_stats_arrays

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    keep = quality_stats_arrays(docs["text"])["gopher_keep"].astype(bool)
    g = docs["text"].to_pandas()[keep].tolist()[:9]
    assert len(g) == 9
    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "url": ["https://a.com/x", "https://a.com/x",  # url dup: 1 loses
                "https://b.com/y", None, None,          # nulls pass through
                "https://c.com/z", "https://d.com/z",
                "https://e.com/1", "https://e.com/2",
                "https://f.com/3", "https://g.com/4", "https://h.com/5"],
        "text": [g[0], g[1],
                 "tiny",                                 # gopher-gated
                 g[2], g[2],                             # content dup: 4 loses
                 g[3] + " call 555-123-4567 now", g[4],
                 g[0],                                   # dup of id 0
                 "tiny too",                             # gopher-gated
                 g[5], g[6], g[7]],
    })
    steps = ("url_dedup", "gopher", "exact_dedup", "pii")
    out = clean_corpus(rd.from_pandas(df), url_col="url", steps=steps,
                       num_buckets=4).to_pandas().sort_values("doc_id")
    ids = set(out["doc_id"])
    assert {1, 2, 4, 7, 8} & ids == set()  # url dup, gated, content dups
    assert {0, 3, 9, 10, 11} <= ids        # survivors incl. null urls
    assert not out["text"].str.contains("555-123-4567").any()  # PII gone


def test_clean_corpus_partitioned_twopass(ray_session, tmp_path):
    """dedup_method='twopass' in phase B produces the same final
    survivor set as the shuffle cascade (the fat-row production
    shape over the phase-A checkpoint)."""
    from ocgis_ray.pipelines.cleaning import clean_corpus_partitioned
    from ocgis_ray.state.lineage import read_manifest

    kwargs = dict(n_partitions=4, filter_steps=("gopher", "pii"),
                  dedup_steps=("exact_dedup",))
    out_a = str(tmp_path / "a")
    clean_corpus_partitioned("/root/testdata/sf0.001/documents.parquet",
                             out_a, **kwargs)
    out_b = str(tmp_path / "b")
    clean_corpus_partitioned("/root/testdata/sf0.001/documents.parquet",
                             out_b, dedup_method="twopass", **kwargs)
    import duckdb

    ids_a = duckdb.sql(f"SELECT doc_id FROM '{out_a}/part=final/*.parquet' "
                       "ORDER BY doc_id").fetchall()
    ids_b = duckdb.sql(f"SELECT doc_id FROM '{out_b}/part=final/*.parquet' "
                       "ORDER BY doc_id").fetchall()
    assert ids_a == ids_b and len(ids_a) > 0

    with pytest.raises(ValueError, match="needs exact_dedup"):
        clean_corpus_partitioned(
            "/root/testdata/sf0.001/documents.parquet",
            str(tmp_path / "c"), n_partitions=2,
            filter_steps=("gopher",), dedup_steps=("near_dup",),
            dedup_method="twopass")
    with pytest.raises(ValueError, match="unknown dedup_method"):
        clean_corpus_partitioned(
            "/root/testdata/sf0.001/documents.parquet",
            str(tmp_path / "d"), dedup_method="nope")


# ------------------------------------------------ document wordlist gate

def test_wordlist_doc_filter_matches_duckdb(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.quality import (wordlist_doc_filter,
                                          wordlist_doc_filter_sql)

    words = ("lottery", "free money", "casino")
    texts = [
        "Win the LOTTERY today and retire early.",     # case-insensitive
        "The lotterys are unrelated words here.",      # \b: no match
        "Get free money now, no strings attached.",    # phrase match
        "A clean document about bird migration.",
        "casino",                                      # whole doc is the word
        "",
        None,
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "i": np.arange(len(texts), dtype=np.int64),
        "text": pd.array(texts, dtype="string"),
    }))
    flagged = wordlist_doc_filter(ds, words, mode="flag").to_pandas() \
        .sort_values("i").reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(texts))),
                                "text": pa.array(texts, type=pa.string())}))
    pred = wordlist_doc_filter_sql(words)
    want = con.execute(
        f"SELECT i, {pred} AS has_blocked FROM t ORDER BY i").fetchdf()
    con.close()
    assert list(flagged["has_blocked"]) == list(want["has_blocked"])
    assert list(flagged["has_blocked"]) == [True, False, True, False,
                                            True, False, False]
    kept = wordlist_doc_filter(ds, words, mode="drop").to_pandas()
    assert sorted(kept["i"]) == [1, 3, 5, 6]


def test_wordlist_step_in_cascade(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["A fine document about science.",
                 "Win the lottery now and always.",
                 "A fine document about science.",   # dup of 0
                 "Another clean piece of writing."],
    })
    out = clean_corpus(rd.from_pandas(df),
                       steps=("wordlist", "exact_dedup"),
                       blocked_words=("lottery",)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 3]
    # explicit wordlist step with no words errors instead of no-op
    with pytest.raises(ValueError, match="blocked_words"):
        clean_corpus(rd.from_pandas(df), steps=("wordlist",))


def test_wordlist_mode_validated_eagerly(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.quality import wordlist_doc_filter

    ds = rd.from_pandas(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(ValueError, match="mode"):
        wordlist_doc_filter(ds, ("w",), mode="flg")
