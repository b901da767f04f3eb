"""Training-data operators: dedup family, similarity search, text analysis,
multimodal plumbing. SQL-oracled queries are verified against DuckDB at
sf0.001 (the same comparison the driver gate runs at sf0.01)."""

import os

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _to_df(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def ducksf():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name",
    ["q1_pricing", "top_orders", "revenue_by_nation", "events_window",
     "distinct_users", "filter_revenue", "dedup_exact", "token_stats",
     "doc_fingerprint", "ann_topk", "knn_batch", "events_asof_join",
     "events_sliding_window", "ann_ivf_full_probe", "value_quantiles",
     "split_by_hash", "dup_clusters", "events_prop_stats",
     "training_corpus_summary", "embedding_centroids",
     "contamination_check", "lang_id", "text_quality",
     "pii_scrub", "repetition_quality", "term_df", "line_dedup",
     "pack_sequences", "normalize_text", "dedup_against", "bigram_pmi",
     "heavy_hitters", "temperature_mix", "within_doc_dedup",
     "inverted_index", "quantile_buckets", "event_funnel",
     "revenue_rollup", "time_band_join", "group_quantiles", "pagerank",
     "cohort_retention", "link_degree_stats", "pca_parity",
     "bm25_topk", "ann_filtered", "host_pagerank_parity",
     "pagerank_weighted_sample", "events_anomaly",
     "order_totals_join", "customers_without_orders",
     "minlabel_components", "model_score", "knn_graph",
     "bpe_encode_parity", "anchor_text_parity",
     "epoch_shuffle", "data_card", "dsir_importance", "gopher_repetition",
     "gopher_quality", "semdedup", "logreg_parity", "tokenized_shards",
     "pq_recall", "countmin_check", "packed_token_shards",
     "kll_quantiles_check", "blocklist_filter", "hits", "bfs_distance",
     "kcore_peel", "ngram_containment", "phrase_search", "token_budget",
     "bloom_fpr_check", "score_calibration", "scc_certificate",
     "wordpiece_parity", "wordpiece_encode_parity", "nn_descent_recall",
     "kmv_overlap", "cdx_index_parity", "mime_sniff_check",
     "random_walks", "jpeg_roundtrip", "crawl_lineage_check",
     "chunk_passages", "ccnet_buckets", "kn_lm_score", "flac_roundtrip",
     "media_ingest"],
)
def test_sql_oracled_query(ray_session, ducksf, name):
    import __ray_entry__ as E

    df = _norm(_to_df(E.queries()[name](SF)))
    odf = _norm(ducksf.execute(E.oracle_sql()[name]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        # dtype parity FIRST: the driver gate's value hash is dtype-
        # sensitive (int64 vs float64 was the round-1 5-query failure), so
        # a values-only comparison would not predict the gate
        assert df[c].dtype == odf[c].dtype, \
            f"{name}.{c}: {df[c].dtype} != {odf[c].dtype}"
        a, b = df[c].values, odf[c].values
        assert (pd.Series(a) == pd.Series(b)).all(), f"{name}.{c}"


# --- dedup on a corpus that actually HAS duplicates ------------------------


@pytest.fixture(scope="module")
def dup_docs_dir(tmp_path_factory):
    """documents.parquet with exact dups and near-dups planted."""
    d = tmp_path_factory.mktemp("dupdocs")
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun"
    )
    texts = {
        0: base,
        1: base,                                    # exact dup of 0
        2: base.replace("afternoon", "morning"),    # near dup of 0
        3: "completely different content about ray data pipelines and arrow",
        4: "completely different content about ray data pipelines and arrow",
        5: "unrelated short text",
        6: base.replace("quick", "slow").replace("lazy", "sleepy"),  # near dup
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(texts[k]) for k in sorted(texts)], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_dedup_exact_finds_planted_dups(ray_session, dup_docs_dir):
    from pholcus_ray.pipelines.textdata import dedup_exact

    df = dedup_exact(dup_docs_dir).to_pandas()
    dups = df[df["n_copies"] > 1]
    assert set(dups["keep_id"]) == {0, 3}
    assert dups.set_index("keep_id")["n_copies"].to_dict() == {0: 2, 3: 2}


def test_langid_sql_oracle_parity_adversarial():
    """The lang_id SQL oracle must reproduce langid_predict on the hard
    cases the sf corpora don't exercise: empty/whitespace docs, every
    stopword profile, cross-language ties (first-in-order wins), the CJK
    ratio boundary, and unicode case-folding."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import langid_predict

    texts = [
        "", "   ", "the cat and the dog is in it for a that",
        "el que la y en un una los las de",
        "der die das und ist nicht ein mit für auf",
        "le la les de des et est une dans pour",
        "de la le",          # es/fr overlap -> fr wins strictly
        "und the de",        # three-way tie -> en (first in order)
        "一二三四五六七八九十 hello",
        "one 一 two three four five six seven eight nine ten eleven twelve",
        "FÜR UND IST DAS",   # unicode lower()
        "xyz qqq www",       # zero scores -> en
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    con = duckdb.connect()
    con.register("documents", tbl)
    sql = E.oracle_sql()["lang_id"]
    got = dict(con.execute(sql).fetchall())
    want: dict = {}
    for p in langid_predict(texts):
        want[p] = want.get(p, 0) + 1
    assert got == want


def test_mulmod_p61_matches_bigint():
    """The vectorized Mersenne mulmod must equal python big-int arithmetic
    (a plain uint64 multiply would wrap mod 2^64 and bias the minhash)."""
    import numpy as np

    from pholcus_ray.pipelines.textdata import _MERSENNE, _mulmod_p61

    rng = np.random.default_rng(11)
    a = rng.integers(1, _MERSENNE, size=500, dtype=np.int64).astype(np.uint64)
    x = rng.integers(0, _MERSENNE, size=500, dtype=np.int64).astype(np.uint64)
    got = _mulmod_p61(a, x)
    want = [(int(ai) * int(xi)) % _MERSENNE for ai, xi in zip(a, x)]
    assert got.tolist() == want
    # boundary values: p-1 squared, zero, one
    edge = np.array([_MERSENNE - 1, 0, 1, _MERSENNE - 1], dtype=np.uint64)
    other = np.array([_MERSENNE - 1, 5, _MERSENNE - 1, 1], dtype=np.uint64)
    assert _mulmod_p61(edge, other).tolist() == [
        ((_MERSENNE - 1) ** 2) % _MERSENNE, 0, _MERSENNE - 1, _MERSENNE - 1
    ]


@pytest.fixture(scope="module")
def pii_docs_dir(tmp_path_factory):
    """documents.parquet rich in the signals the sf corpora lack: PII
    (emails/IPv4/phones), duplicated lines/tokens, empty and CJK docs."""
    d = tmp_path_factory.mktemp("piidocs")
    texts = [
        "Contact john.doe@example.com or admin@sub.domain.org today",
        "server 10.0.0.1 and gateway 192.168.1.254\ncall +1 415-555-0100",
        "spam spam spam spam ham",
        "line a\nline b\nline a\nline a\n\n",
        "",
        "   ",
        "no signals here just plain prose",
        "mixed: a@b.co at 8.8.8.8 phone 021 5550 1234 ok",
        "一二三 一二三 repeated cjk tokens",
        "dots.but.no.at and 300.300.300.300 still matches ipv4 regex",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_pii_scrub_planted(ray_session, pii_docs_dir):
    """Engine vs oracle on a fixture where every regex branch fires (the
    sf corpora contain zero PII, so the gate's green is trivial there),
    plus hand-checked expected counts so both sides can't agree on wrong."""
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import pii_scrub

    df = _norm(_to_df(pii_scrub(pii_docs_dir)))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["pii_scrub"]).df())
    assert list(df.columns) == list(odf.columns)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype
        assert (df[c].values == odf[c].values).all(), c
    by = df.set_index("doc_id")
    assert by.loc[0, "n_email"] == 2 and by.loc[0, "n_ipv4"] == 0
    assert by.loc[1, "n_ipv4"] == 2 and by.loc[1, "n_phone"] == 1
    assert by.loc[7, "n_email"] == 1 and by.loc[7, "n_ipv4"] == 1
    assert by.loc[7, "n_phone"] == 1
    assert by.loc[9, "n_ipv4"] == 1          # documented: no octet range check
    assert (by.loc[[4, 5, 6], ["n_email", "n_ipv4", "n_phone"]] == 0).all().all()
    # redaction actually rewrites the text (md5 changes where PII exists)
    import hashlib
    raw = pq.read_table(os.path.join(pii_docs_dir, "documents.parquet"))
    raw_md5 = {i: hashlib.md5(x.encode()).hexdigest()
               for i, x in zip(raw["doc_id"].to_pylist(), raw["text"].to_pylist())}
    assert by.loc[0, "scrubbed_md5"] != raw_md5[0]
    assert by.loc[6, "scrubbed_md5"] == raw_md5[6]


def test_repetition_quality_planted(ray_session, pii_docs_dir):
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import repetition_quality

    df = _norm(_to_df(repetition_quality(pii_docs_dir)))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["repetition_quality"]).df())
    assert list(df.columns) == list(odf.columns)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype
        assert (df[c].values == odf[c].values).all(), c
    by = df.set_index("doc_id")
    # "spam spam spam spam ham": 5 tokens, 3 dup, top freq 4/5
    assert by.loc[2, "n_tokens"] == 5 and by.loc[2, "n_dup_tokens"] == 3
    assert by.loc[2, "top_token_frac"] == 0.8
    # "line a\nline b\nline a\nline a\n\n" -> 6 lines (two trailing ''),
    # dups: 'line a' x3 -> 2, '' x2 -> 1
    assert by.loc[3, "n_lines"] == 6 and by.loc[3, "n_dup_lines"] == 3
    assert by.loc[3, "dup_line_frac"] == 0.5
    assert by.loc[4, "n_tokens"] == 0 and by.loc[4, "dup_token_frac"] == 0.0


def test_term_df_planted(ray_session, pii_docs_dir):
    """DF counts DOCUMENTS (distinct per doc), not occurrences; ties break
    by token; top_k truncates deterministically on both sides."""
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import term_df

    df = _to_df(term_df(pii_docs_dir)).sort_values(
        ["df", "token"], ascending=[False, True]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = con.execute(E.oracle_sql()["term_df"]).df()
    assert df["token"].tolist() == odf["token"].tolist()
    assert df["df"].tolist() == odf["df"].tolist()
    assert df["df"].dtype == odf["df"].dtype
    by = dict(zip(df["token"], df["df"]))
    assert by["spam"] == 1          # 4 occurrences, 1 document
    assert by["一二三"] == 1
    # top_k boundary is honored with full deterministic order
    small = _to_df(term_df(pii_docs_dir, top_k=3))
    assert len(small) == 3
    assert small.sort_values(["df", "token"], ascending=[False, True])[
        "token"].tolist() == df["token"].tolist()[:3]


def test_chunk_docs_planted(ray_session, pii_docs_dir):
    """Window arithmetic on docs the sf corpora don't exercise: empty,
    single-token, exactly-stride, and multi-chunk docs; overlap content
    verified by md5 against a hand-rolled reference."""
    import hashlib

    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import chunk_docs

    df = _norm(_to_df(chunk_docs(pii_docs_dir)))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["chunk_docs"]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype
        assert (df[c].values == odf[c].values).all(), c
    # small windows force multi-chunk output; verify exact overlap content
    small = _to_df(chunk_docs(pii_docs_dir, chunk_tokens=4, overlap=2))
    raw = pq.read_table(os.path.join(pii_docs_dir, "documents.parquet"))
    texts = dict(zip(raw["doc_id"].to_pylist(), raw["text"].to_pylist()))
    want = []
    for did in sorted(texts):
        tk = texts[did].split()
        for i in range((len(tk) + 1) // 2):
            w = tk[i * 2: i * 2 + 4]
            want.append((did, i, len(w),
                         hashlib.md5(" ".join(w).encode()).hexdigest()))
    got = list(small.sort_values(["doc_id", "chunk_idx"]).itertuples(index=False, name=None))
    assert got == want
    # empty/whitespace docs emit no chunks
    assert not set(small["doc_id"]) & {4, 5}
    with pytest.raises(ValueError):
        chunk_docs(pii_docs_dir, chunk_tokens=4, overlap=4)


def test_substring_dups_planted(ray_session, tmp_path_factory):
    """A 24-token passage planted in docs 0/1/2 (at different offsets and
    with different surroundings) must surface; unique docs must not.
    Engine vs the SQL oracle AND vs a hand-rolled brute force, so both
    sides can't agree on wrong."""
    import hashlib

    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import substring_dups

    d = str(tmp_path_factory.mktemp("subdup"))
    passage = " ".join(f"shared{i}" for i in range(24))
    texts = [
        "intro words here " + passage + " tail one",
        passage + " totally different ending tokens",
        "a much longer unrelated prefix goes on for a while " + passage,
        "no overlap at all in this document " + " ".join(
            f"uniq{i}" for i in range(30)),
        "",
        "short",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    df = _norm(_to_df(substring_dups(d)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["substring_dups"]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c

    # brute force: every kept 16-token window shared by >=2 distinct docs
    from collections import defaultdict
    bucket: dict[str, list[int]] = defaultdict(list)
    for did, x in enumerate(texts):
        tk = x.split()
        for i in range(max(len(tk) - 15, 0)):
            h = hashlib.md5(" ".join(tk[i:i + 16]).encode()).hexdigest()
            if h[7] in "048c":
                bucket[h].append(did)
    want = sorted(h for h, ds_ in bucket.items() if len(set(ds_)) >= 2)
    assert df["window_md5"].tolist() == want
    assert len(want) > 0  # the planted passage must actually surface
    # every surfaced window involves only the three passage-carrying docs
    assert (df["doc_lo"] >= 0).all() and (df["doc_hi"] <= 2).all()
    with pytest.raises(ValueError):
        substring_dups(d, keep_mod=3)


def test_line_dedup_planted(ray_session, tmp_path_factory):
    """A footer line shared by 3 docs must be removed from all of them; a
    line repeated WITHIN one doc only (1 distinct doc) must survive; empty
    docs round-trip. Engine vs the SQL oracle AND vs a hand-rolled brute
    force."""
    import hashlib

    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import line_dedup

    d = str(tmp_path_factory.mktemp("linededup"))
    footer = "copyright example corp all rights reserved."
    texts = [
        "unique first line of doc zero.\nsome middle content here.\n" + footer,
        "doc one opens differently.\n" + footer + "\nand closes uniquely.",
        footer + "\ndoc two body text goes here.",
        "internal repeat line.\ninternal repeat line.\nunique tail.",
        "",
        "single line no dupes anywhere.",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    df = _norm(_to_df(line_dedup(d)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["line_dedup"]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c

    # brute force
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    lines_of = {i: x.split("\n") for i, x in enumerate(texts)}
    docs_per_line: dict = {}
    for i, lines in lines_of.items():
        for ln in set(lines):
            docs_per_line.setdefault(md5(ln), set()).add(i)
    dup = {h for h, ds_ in docs_per_line.items() if len(ds_) >= 2}
    by_id = df.set_index("doc_id")
    for i, lines in lines_of.items():
        kept = [md5(ln) for ln in lines if md5(ln) not in dup]
        assert by_id.loc[i, "n_lines"] == len(lines)
        assert by_id.loc[i, "n_removed"] == sum(
            1 for ln in lines if md5(ln) in dup)
        assert by_id.loc[i, "kept_md5"] == md5_str("".join(kept))
    # the footer was removed from docs 0-2; the internal repeat survived
    assert by_id.loc[0, "n_removed"] == 1
    assert by_id.loc[1, "n_removed"] == 1
    assert by_id.loc[2, "n_removed"] == 1
    assert by_id.loc[3, "n_removed"] == 0
    assert by_id.loc[4, "n_removed"] == 0


def md5_str(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_pack_sequences_planted(ray_session, tmp_path_factory):
    """Packing invariants: the token stream is contiguous (each offset =
    previous offset + previous n_tokens) in (key, doc_id) order, duplicate
    texts tie-break by doc_id, zero-token docs pack nothing, and span
    boundaries honor seq_len. Engine vs the SQL oracle on the same data."""
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import pack_sequences

    d = str(tmp_path_factory.mktemp("packseq"))
    texts = [
        "one two three four five six seven",      # 7 tokens
        "a b c",                                   # 3 tokens
        "a b c",                                   # dup text: tie-break
        "",                                        # drops
        "   ",                                     # drops
        " ".join(f"w{i}" for i in range(11)),      # 11 tokens
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    df = _to_df(pack_sequences(d, seq_len=8)).sort_values(
        "token_offset").reset_index(drop=True)
    # zero-token docs drop
    assert set(df["doc_id"]) == {0, 1, 2, 5}
    # contiguous stream in (key, doc_id) order
    assert df["token_offset"].iloc[0] == 0
    for i in range(1, len(df)):
        assert df["token_offset"].iloc[i] == (
            df["token_offset"].iloc[i - 1] + df["n_tokens"].iloc[i - 1])
        assert (df["key"].iloc[i], df["doc_id"].iloc[i]) > (
            df["key"].iloc[i - 1], df["doc_id"].iloc[i - 1])
    # identical texts adjacent, doc_id ascending
    dups = df[df["doc_id"].isin([1, 2])]
    assert dups["doc_id"].tolist() == [1, 2]
    assert dups["token_offset"].diff().dropna().eq(3).all()
    # span math
    assert (df["seq_begin"] == df["token_offset"] // 8).all()
    assert (df["seq_end"] == (df["token_offset"] + df["n_tokens"] - 1) // 8).all()
    assert (df["seq_end"] >= df["seq_begin"]).all()

    # engine vs oracle (seq_len=256 = the registered query shape)
    dfo = _norm(_to_df(pack_sequences(d)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["pack_sequences"]).df())
    assert list(dfo.columns) == list(odf.columns)
    assert len(dfo) == len(odf)
    for c in dfo.columns:
        assert dfo[c].dtype == odf[c].dtype, c
        assert (dfo[c].values == odf[c].values).all(), c
    with pytest.raises(ValueError):
        pack_sequences(d, num_buckets=48)


def test_tfidf_topk_planted(ray_session, pii_docs_dir):
    """Engine vs oracle on docs with ties, empty docs, and corpus-wide
    tokens; plus a hand-computed check that a rare repeated token beats a
    common one."""
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import tfidf_topk

    df = _norm(_to_df(tfidf_topk(pii_docs_dir)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["tfidf_topk"]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c
    # doc 2 = "spam spam spam spam ham": spam tf=4 df=1 -> 4e6 beats
    # ham tf=1 df=1 -> 1e6; both beat nothing else (doc has 2 terms)
    d2 = df[df["doc_id"] == 2].sort_values("score_micro", ascending=False)
    assert d2["token"].tolist() == ["spam", "ham"]
    assert d2["score_micro"].tolist() == [4_000_000, 1_000_000]
    # empty/whitespace docs emit no rows; every doc emits <= 5
    assert not set(df["doc_id"]) & {4, 5}
    assert df.groupby("doc_id").size().max() <= 5


@pytest.fixture(scope="module")
def quota_docs_dir(tmp_path_factory):
    """documents.parquet with a skewed source distribution and mixed
    languages for the quota/stratified-sampling operators."""
    d = str(tmp_path_factory.mktemp("quotadocs"))
    rows = []
    for i in range(30):
        rows.append((i, f"hot source doc number {i} with words", "en", "hot"))
    for i in range(30, 34):
        rows.append((i, f"cold doc {i}", "de", "cold"))
    rows.append((34, "", "fr", "cold"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


def test_source_quota_planted(ray_session, quota_docs_dir):
    """The hot source must be cut to exactly the quota by hash order (not
    doc_id order); small sources pass through whole."""
    import hashlib

    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import source_quota

    df = _norm(_to_df(source_quota(quota_docs_dir, quota=10)))
    # hand-rolled expectation
    raw = pq.read_table(os.path.join(quota_docs_dir, "documents.parquet"))
    by_src: dict = {}
    for did, tx, src in zip(raw["doc_id"].to_pylist(),
                            raw["text"].to_pylist(),
                            raw["source"].to_pylist()):
        by_src.setdefault(src, []).append(
            (hashlib.md5(tx.encode()).hexdigest(), did))
    want = set()
    for src, lst in by_src.items():
        for h, did in sorted(lst)[:10]:
            want.add(did)
    assert set(df["doc_id"]) == want
    assert (df[df["source"] == "hot"].shape[0]) == 10
    assert (df[df["source"] == "cold"].shape[0]) == 5
    # default-quota (10) engine vs oracle parity: the hot source is cut,
    # the cold one passes whole
    dfo = _norm(_to_df(source_quota(quota_docs_dir)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{quota_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["source_quota"]).df())
    assert list(dfo.columns) == list(odf.columns) and len(dfo) == len(odf)
    for c in dfo.columns:
        assert dfo[c].dtype == odf[c].dtype, c
        assert (dfo[c].values == odf[c].values).all(), c


def test_stratified_sample_planted(ray_session, quota_docs_dir):
    """Rates are honored exactly (content-hash buckets), zh/unknown keep
    everything, and engine == oracle on a mixed-language fixture."""
    import hashlib

    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import stratified_sample

    df = _norm(_to_df(stratified_sample(quota_docs_dir)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{quota_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["stratified_sample"]).df())
    assert list(df.columns) == list(odf.columns) and len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c
    # brute-force the keep rule
    raw = pq.read_table(os.path.join(quota_docs_dir, "documents.parquet"))
    rates = {"en": 50, "zh": 100, "de": 25, "fr": 25, "es": 25}
    want = []
    for did, tx, lg in zip(raw["doc_id"].to_pylist(),
                           raw["text"].to_pylist(),
                           raw["lang"].to_pylist()):
        b = int(hashlib.md5(tx.encode()).hexdigest()[:8], 16) % 100
        if b < rates.get(lg, 100):
            want.append(did)
    assert sorted(df["doc_id"].tolist()) == sorted(want)
    # a full-rate stratum keeps everything: all-zh custom rates
    all_kept = _to_df(stratified_sample(quota_docs_dir,
                                        rates={"en": 100, "de": 100,
                                               "fr": 100}))
    assert len(all_kept) == raw.num_rows


def test_c4_filters_planted(ray_session, tmp_path_factory):
    """Every C4 rule branch fires: terminal-punct pass/fail, trailing
    ASCII whitespace before the punct, the 5-word floor, javascript
    lines, lorem-ipsum and brace doc kills, tab-separated words, empty
    docs. Engine vs oracle plus hand-computed verdicts."""
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import c4_filters

    d = str(tmp_path_factory.mktemp("c4docs"))
    good = "this line has enough words to pass the filter."
    texts = [
        "\n".join([good, good + "!", good + '"', "too short.",
                   "no terminal punctuation here at all",
                   good.replace("words", "javascript")]),   # 3 kept -> keep
        "\n".join([good, good]),                            # 2 kept -> drop
        "\n".join([good, good, good + " \t "]),             # ws after punct
        "\n".join([good, good, good, "Lorem Ipsum dolor sit amet."]),
        "\n".join([good, good, good, "code { not prose }"]),
        "a\tb\tc\td\tends with tab separated words.",       # tabs as \s
        "",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    df = _norm(_to_df(c4_filters(d)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["c4_filters"]).df())
    assert list(df.columns) == list(odf.columns) and len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c
    got = df.set_index("doc_id")
    assert got.loc[0, "n_kept_lines"] == 3 and bool(got.loc[0, "keep"])
    assert got.loc[1, "n_kept_lines"] == 2 and not got.loc[1, "keep"]
    # trailing " \t " after the '.' still counts as terminal punctuation
    assert got.loc[2, "n_kept_lines"] == 3 and bool(got.loc[2, "keep"])
    assert not got.loc[3, "keep"] and not got.loc[4, "keep"]  # lorem/brace
    # tab-separated words count as words (7 >= 5), line ends in '.'
    assert got.loc[5, "n_kept_lines"] == 1
    assert got.loc[6, "n_lines"] == 1 and got.loc[6, "n_kept_lines"] == 0


def test_minhash_lsh_finds_near_dups(ray_session, dup_docs_dir):
    from pholcus_ray.pipelines.textdata import dedup_minhash_lsh

    df = dedup_minhash_lsh(dup_docs_dir, threshold=0.5).to_pandas()
    pairs = set(zip(df["a"], df["b"]))
    assert (0, 1) in pairs            # exact dup -> est_jaccard 1.0
    assert (3, 4) in pairs
    assert (0, 2) in pairs            # near dup shares most shingles
    assert df[(df["a"] == 0) & (df["b"] == 1)]["est_jaccard"].iloc[0] == 1.0


def test_minhash_lsh_deterministic(ray_session, dup_docs_dir):
    from pholcus_ray.pipelines.textdata import dedup_minhash_lsh

    a = dedup_minhash_lsh(dup_docs_dir, threshold=0.3).to_pandas()
    b = dedup_minhash_lsh(dup_docs_dir, threshold=0.3).to_pandas()
    assert a.equals(b)


def test_simhash_near_dups(ray_session, dup_docs_dir):
    from pholcus_ray.pipelines.textdata import simhash_docs, simhash_near_dups

    sh = simhash_docs(dup_docs_dir).to_pandas()
    assert sh.loc[sh.doc_id == 0, "simhash"].iloc[0] == sh.loc[sh.doc_id == 1, "simhash"].iloc[0]
    pairs = simhash_near_dups(dup_docs_dir, max_hamming=8).to_pandas()
    ps = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in ps and (3, 4) in ps
    assert (0, 2) in ps  # one-word change -> small hamming distance


@pytest.mark.parametrize("h", [0, 3, 8])
def test_simhash_banding_guarantee_full_recall(ray_session, dup_docs_dir, h):
    """The banding must return EXACTLY the pairs at hamming <= max_hamming
    (round-1 verdict: 4x16-bit bands only guaranteed distance <= 3 while
    the default max_hamming was 8, silently dropping pairs at 4-8).
    Brute-force all-pairs distance over simhash_docs is the oracle."""
    import numpy as np

    from pholcus_ray.pipelines.textdata import simhash_docs, simhash_near_dups

    sh = simhash_docs(dup_docs_dir).to_pandas().sort_values("doc_id")
    ids = sh["doc_id"].to_numpy()
    hs = sh["simhash"].to_numpy().astype(np.uint64)
    expected = set()
    for i in range(len(ids)):
        x = np.bitwise_xor(hs[i + 1:], hs[i])
        d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        for j, dist in enumerate(d):
            if dist <= h:
                expected.add((int(ids[i]), int(ids[i + 1 + j])))
    got = simhash_near_dups(dup_docs_dir, max_hamming=h).to_pandas()
    assert set(zip(got["a"], got["b"])) == expected
    assert (got["hamming"] <= h).all()


def test_ngram_jaccard_pairs(ray_session, dup_docs_dir):
    from pholcus_ray.pipelines.textdata import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(dup_docs_dir, threshold=0.5).to_pandas()
    ps = dict(zip(zip(df["a"], df["b"]), df["jaccard"]))
    assert ps[(0, 1)] == 1.0
    assert ps[(0, 2)] > 0.8


def test_ngram_jaccard_exact_complete(ray_session, dup_docs_dir):
    """The prefix-filtered similarity join must equal brute-force exact
    Jaccard over ALL pairs (complete recall — its defining property vs the
    LSH-candidate variant)."""
    import itertools

    from pholcus_ray.pipelines.textdata import (_char_ngrams,
                                                ngram_jaccard_exact)

    tb = pq.read_table(os.path.join(dup_docs_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    texts = dict(zip(tb["doc_id"].to_pylist(), tb["text"].to_pylist()))
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = _char_ngrams(texts[a], 3), _char_ngrams(texts[b], 3)
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= 0.5:
            want[(a, b)] = j
    df = ngram_jaccard_exact(dup_docs_dir, threshold=0.5).to_pandas()
    got = dict(zip(zip(df["a"], df["b"]), df["jaccard"]))
    assert got == want
    assert got[(0, 1)] == 1.0 and got[(3, 4)] == 1.0  # planted exact dups


def test_lang_id_heuristic_fixtures(ray_session):
    from pholcus_ray.pipelines.textdata import langid_predict

    preds = langid_predict(
        [
            "the cat sat on the mat and it was happy in the sun",
            "el gato se sienta en la alfombra y es feliz en el sol",
            "der Hund ist nicht glücklich und das ist ein Problem",
            "le chat est dans la maison et les enfants sont pour lui",
            "这是一个中文句子，用来测试语言识别。",
            "",
        ]
    )
    assert preds == ["en", "es", "de", "fr", "zh", "und"]


def test_text_quality_features(ray_session):
    from pholcus_ray.pipelines.textdata import text_quality

    df = text_quality(SF).to_pandas()
    assert len(df) == 500
    assert (df["n_tokens"] > 0).all()
    assert ((df["quality"] >= 0) & (df["quality"] <= 1)).all()
    assert (df["n_bpe_tokens"] >= df["n_tokens"]).all()


# --- similarity ------------------------------------------------------------


def test_ann_ivf_recall(ray_session):
    from pholcus_ray.pipelines.similarity import ann_ivf, ann_topk

    brute = ann_topk(SF, k=10).to_pandas()
    # uniform random vectors are near-orthogonal, the worst case for IVF;
    # recall must still rise with nprobe and reach 1.0 at nprobe=n_clusters
    ivf4 = ann_ivf(SF, k=10, nprobe=4).to_pandas()
    ivf8 = ann_ivf(SF, k=10, n_clusters=8, nprobe=8).to_pandas()
    # result size is exactly k — recall via intersection alone would also
    # accept a regression that returns every probed vector
    assert len(ivf4) == 10 and len(ivf8) == 10
    r4 = len(set(brute["vec_id"]) & set(ivf4["vec_id"])) / 10
    r8 = len(set(brute["vec_id"]) & set(ivf8["vec_id"])) / 10
    assert r4 >= 0.5
    assert r8 == 1.0  # probing every partition == brute force
    # the query vector itself is always found (cos = 1)
    assert ivf4["vec_id"].iloc[0] == 0


def test_srp_lsh_recall(ray_session):
    from pholcus_ray.pipelines.similarity import ann_topk, srp_topk

    brute = srp_topk(SF, k=10, nbits=0).to_pandas()
    exact = ann_topk(SF, k=10).to_pandas()
    # nbits=0 collides every bucket: the LSH path degrades to exact brute
    # force — identical ranking proves the candidate filter only FILTERS
    assert list(brute["vec_id"]) == list(exact["vec_id"])
    srp = srp_topk(SF, k=10).to_pandas()
    assert len(srp) == 10
    recall = len(set(exact["vec_id"]) & set(srp["vec_id"])) / 10
    # 16 tables x 6 sign bits on near-orthogonal uniform vectors: measured
    # 0.6-0.9 across SFs with the fixed-seed planes (deterministic)
    assert recall >= 0.5
    # the query vector collides with itself in every table (cos = 1)
    assert srp["vec_id"].iloc[0] == 0


# --- multimodal plumbing ---------------------------------------------------


def test_multimodal_decode_roundtrip(ray_session):
    import ray.data as rd

    from pholcus_ray.stages.multimodal import (
        DecodeImage,
        ResizeImage,
        synth_image_table,
    )

    t = synth_image_table(50)
    out = (
        rd.from_arrow(t)
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=16, concurrency=2)
        .sort("image_id")
        .to_pandas()
    )
    src = t.to_pandas()
    assert (out["decoded_width"].values == src["width"].values).all()
    assert (out["decoded_height"].values == src["height"].values).all()
    assert (out["decoded_format"].values == src["format"].values).all()

    small = (
        rd.from_arrow(t)
        .map_batches(ResizeImage, batch_format="pyarrow", batch_size=16, concurrency=2)
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert (small["decoded_width"] <= 16 + 1).all()


def test_multimodal_real_backend_is_stubbed():
    from pholcus_ray.stages.multimodal import (DecodeAudio, DecodeImage,
                                               SampleFrames)

    for cls in (DecodeImage, DecodeAudio, SampleFrames):
        with pytest.raises(NotImplementedError):
            cls(backend="real")


def test_multimodal_audio_features(ray_session):
    import ray.data as rd

    from pholcus_ray.stages.multimodal import DecodeAudio, synth_audio_table

    t = synth_audio_table(60)
    ds = rd.from_arrow([t.slice(i, 15) for i in range(0, 60, 15)])
    df = ds.map_batches(DecodeAudio, batch_format="pyarrow", batch_size=16,
                        concurrency=2).sort("audio_id").to_pandas()
    assert len(df) == 60
    # features derive from the true header/body: duration = n/sr exactly
    src = t.to_pandas()
    # python round(), not pandas .round(): the two disagree on some values
    # (correctly-rounded decimal vs scaled np.around) and the stage uses python's
    want = np.array([round(float(x), 6)
                     for x in src["n_samples"] / src["sample_rate"]])
    assert (df["duration_sec"].values == want).all()
    assert (df["rms"] > 0).all() and (df["zero_crossings"] > 0).all()
    # deterministic across runs
    df2 = rd.from_arrow(t).map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=16, concurrency=1
    ).sort("audio_id").to_pandas()
    assert (df["content_hash"].values == df2["content_hash"].values).all()


def test_multimodal_frame_sample_composes_with_decode(ray_session):
    import ray.data as rd

    from pholcus_ray.stages.multimodal import (DecodeImage, SampleFrames,
                                               synth_video_table)

    t = synth_video_table(12)
    df = (
        rd.from_arrow([t.slice(i, 3) for i in range(0, 12, 3)])
        .map_batches(SampleFrames, batch_format="pyarrow", batch_size=4,
                     concurrency=2)
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=32,
                     concurrency=2)
        .sort(["video_id", "frame_idx"])
        .to_pandas()
    )
    src = t.to_pandas().set_index("video_id")
    # every stride-4 frame sampled once, frame 0 always present
    for vid, g in df.groupby("video_id"):
        nf = int(src.loc[vid, "n_frames"])
        assert list(g["frame_idx"]) == list(range(0, nf, 4))
        # decode passes video lineage through and sees the raw frame dims
        assert (g["decoded_width"] == src.loc[vid, "width"]).all()
        assert (g["decoded_height"] == src.loc[vid, "height"]).all()
        assert (g["decoded_format"] == "raw").all()
    assert {"video_id", "frame_idx", "image_id"} <= set(df.columns)


def test_dsir_importance_planted(ray_session, tmp_path_factory):
    """DSIR weights on a planted fixture: en docs share one vocabulary,
    de docs another — every en doc must outscore every de doc (its hashed
    n-grams sit in buckets the target distribution overweights), and the
    engine must match the DuckDB oracle bit-for-bit."""
    import __ray_entry__ as E

    d = tmp_path_factory.mktemp("dsirdocs")
    en = "the model trains on clean english prose with common words"
    de = "das modell trainiert auf sauberem deutschem text mit worten"
    texts = [en, en + " and more english prose", en.replace("clean", "neat"),
             de, de + " und noch mehr deutscher text", ""]
    langs = ["en", "en", "en", "de", "de", "de"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))

    df = _to_df(E.queries()["dsir_importance"](str(d))).set_index("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = con.execute(E.oracle_sql()["dsir_importance"]).df().set_index("doc_id")
    for c in ("n_grams", "dsir_weight"):
        assert (df[c] == odf[c]).all(), c
    w = df["dsir_weight"]
    assert min(w[0], w[1], w[2]) > max(w[3], w[4])  # en > de
    assert w[5] == 0.0  # tokenless doc


def test_ngram_dense_and_prefix_paths_agree(ray_session, monkeypatch):
    """The G-adaptive plan split must be invisible in the result: the
    dense indicator-matmul bucket-pair join (small realized vocabulary)
    and the prefix-filter + verify chain (the large-G / word plan) return
    bit-identical pair sets and jaccard values on the same corpus."""
    import pholcus_ray.pipelines.textdata as T

    sf = "/root/testdata/sf0.001"
    dense = _to_df(T.ngram_jaccard_exact(sf)).reset_index(drop=True)
    monkeypatch.setenv("PHOLCUS_NGRAM_DENSE_MAX", "0")
    prefix = _to_df(T.ngram_jaccard_exact(sf)).reset_index(drop=True)
    assert len(dense) > 0
    assert len(dense) == len(prefix)
    for c in ("a", "b", "jaccard"):
        assert (dense[c].values == prefix[c].values).all(), c


def test_gopher_repetition_planted(ray_session, tmp_path_factory):
    """Planted fixture: a boilerplate doc (one line repeated 5x) must fail
    the dup-line filters, a loop doc ('buy now' x 30) must fail the
    top-2-gram filter, a clean doc must pass all five; every value matches
    the DuckDB oracle bit-for-bit."""
    import __ray_entry__ as E

    d = tmp_path_factory.mktemp("gopherdocs")
    clean = ("the quick brown fox jumps over a lazy dog\n"
             "pack my box with five dozen liquor jugs\n"
             "sphinx of black quartz judge my vow")
    boiler = "click here to subscribe\n" * 5 + "one real line of text"
    loop = "buy now " * 30
    texts = [clean, boiler, loop.strip(), ""]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))

    df = _to_df(E.queries()["gopher_repetition"](str(d))).set_index("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = con.execute(E.oracle_sql()["gopher_repetition"]).df() \
        .set_index("doc_id")
    for c in df.columns:
        assert (df[c] == odf[c]).all(), (c, df[c].tolist(), odf[c].tolist())
    assert bool(df.loc[0, "keep"]) and bool(df.loc[3, "keep"])
    assert not bool(df.loc[1, "keep"])  # repeated boilerplate line
    assert not bool(df.loc[2, "keep"])  # 'buy now' loop
    assert df.loc[2, "top_bigram"] in ("buy now", "now buy")


def test_gopher_quality_planted(ray_session, tmp_path_factory):
    """Planted fixture: a long clean English doc passes; a bullet-list doc
    fails the bullet-line filter; a symbol-heavy doc fails the
    symbol-to-word ratio; a numeric doc fails the alpha-word fraction and
    the stop-word floor; every value matches the DuckDB oracle
    bit-for-bit."""
    import __ray_entry__ as E

    d = tmp_path_factory.mktemp("gopherqdocs")
    clean = " ".join(
        "the quick brown fox jumps over a lazy dog and that is fine to"
        " have with all of it be said".split() * 4)
    bullets = "\n".join("• item %d of the list" % i for i in range(20))
    symbols = "the price is # one # two # three ... more ... and ..." \
              " # # # # # # of that"
    numeric = " ".join(str(i) for i in range(80))
    texts = [clean, bullets, symbols, numeric]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))

    df = _to_df(E.queries()["gopher_quality"](str(d))).set_index("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = con.execute(E.oracle_sql()["gopher_quality"]).df() \
        .set_index("doc_id")
    for c in df.columns:
        assert (df[c] == odf[c]).all(), (c, df[c].tolist(), odf[c].tolist())
    assert bool(df.loc[0, "keep"])
    assert not bool(df.loc[1, "keep"])  # 100% bullet lines
    assert df.loc[1, "bullet_line_frac"] == 1.0
    assert not bool(df.loc[2, "keep"])  # '#'/'...' symbol ratio
    assert df.loc[2, "symbol_word_ratio"] > 0.1
    assert not bool(df.loc[3, "keep"])  # no alpha words, no stop words
    assert df.loc[3, "alpha_word_frac"] == 0.0
    assert df.loc[3, "n_stop_words"] == 0


def test_hll_distinct_users_accuracy(ray_session):
    """Mergeable HLL sketch: within ~3x stderr (1.04/sqrt(4096) ~ 1.6%) of
    the exact distinct count per event_type."""
    from pholcus_ray.pipelines.relational import distinct_users
    from pholcus_ray.pipelines.textdata import hll_distinct_users

    exact = distinct_users(SF).to_pandas().set_index("event_type")["n_users"]
    approx = (
        hll_distinct_users(SF).to_pandas().set_index("event_type")["n_users_approx"]
    )
    assert set(exact.index) == set(approx.index)
    for ty in exact.index:
        rel = abs(approx[ty] - exact[ty]) / exact[ty]
        assert rel < 0.05, (ty, exact[ty], approx[ty])


def test_embedding_near_dups_partitioned_exact(ray_session):
    """The cluster-partitioned pair path must produce the EXACT brute-force
    pair set (triangle-inequality pruning is provably lossless)."""
    from pholcus_ray.pipelines.similarity import (
        _normalize,
        _to_matrix,
        embedding_near_dups,
    )

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    M = _normalize(_to_matrix(t["embedding"]))
    sims = M @ M.T
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= 0.3:
                expected.add((int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))))
    # n_clusters=4 so multiple clusters actually form at this tiny SF
    got = embedding_near_dups(SF, threshold=0.3, n_clusters=4).to_pandas()
    assert set(zip(got["a"], got["b"])) == expected
    assert len(got) == len(expected)  # no duplicate emission across groups


def test_logreg_learns(ray_session):
    """The distributed trainer must actually LEARN, not just agree with
    its twin: train accuracy beats the majority-class baseline by a wide
    margin (the planted contains-token signal is recoverable through the
    hashed presence features), and the parity verdict holds."""
    from pholcus_ray.pipelines.textdata import logreg_parity, logreg_train

    eng = logreg_train(SF).to_pydict()
    n, pos, correct = (eng["n_docs"][0], eng["n_pos"][0],
                       eng["n_correct"][0])
    majority = max(pos, n - pos)
    assert correct >= majority + (n - majority) * 3 // 4, (correct, majority, n)
    par = logreg_parity(SF).to_pydict()
    assert par["parity_ok"] == [1]


def test_semdedup_planted(ray_session, tmp_path_factory):
    """Planted fixture: vectors 0/3/7 are one semantic group (exact copies
    and a tiny perturbation), 1/5 another, 2/4/6 singletons — keep rows
    are the component minima, sizes are exact, and the brute-force
    verdict table matches the DuckDB oracle bit-for-bit."""
    import __ray_entry__ as E

    d = tmp_path_factory.mktemp("semdocs")
    base = np.eye(4, 8)  # orthogonal groups: cross-group cosine is 0
    eps = np.zeros(8)
    eps[7] = 0.001
    vecs = np.stack([
        base[0], base[1], base[2], base[0] + eps, base[3],
        base[1] * 2.0, -base[2], base[0] * 0.5,
    ])
    t = pa.table({
        "vec_id": pa.array(range(8), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
        "label": pa.array([0] * 8, pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "embeddings.parquet"))

    df = _to_df(E.queries()["semdedup"](str(d))).set_index("vec_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    odf = con.execute(E.oracle_sql()["semdedup"]).df().set_index("vec_id")
    for c in df.columns:
        assert (df[c] == odf[c]).all(), (c, df[c].tolist(), odf[c].tolist())
    assert df.loc[0, "cluster_id"] == 0 and df.loc[0, "cluster_size"] == 3
    assert df.loc[3, "cluster_id"] == 0 and not bool(df.loc[3, "keep"])
    assert df.loc[7, "cluster_id"] == 0 and not bool(df.loc[7, "keep"])
    assert df.loc[1, "cluster_id"] == 1 and df.loc[5, "cluster_id"] == 1
    assert bool(df.loc[1, "keep"]) and not bool(df.loc[5, "keep"])
    for v in (2, 4, 6):  # -base[2] is anti-parallel: NOT a dup of 2
        assert df.loc[v, "cluster_size"] == 1 and bool(df.loc[v, "keep"])


def test_write_sharded_parquet_resume(ray_session, tmp_path):
    """Resumable partitioned output: finished shards are skipped on rerun,
    dead-run partials are rewritten, final content is complete."""
    import ray.data as rd

    from pholcus_ray.sinks import write_sharded_parquet

    def make(shard: int):
        t = pa.table({"shard": pa.array([shard] * 10, pa.int64()),
                      "v": pa.array(range(shard * 10, shard * 10 + 10))})
        return rd.from_arrow(t)

    out = str(tmp_path / "out")
    # first run writes shards 0-1 only (simulated death before 2-3)
    assert write_sharded_parquet(make, [0, 1], out) == [0, 1]
    # fake a dead run's partial output for shard 2: dir exists, no marker
    os.makedirs(os.path.join(out, "shard=2"), exist_ok=True)
    with open(os.path.join(out, "shard=2", "junk.parquet"), "w") as f:
        f.write("not parquet")
    # resume over the full key list: 0-1 skipped, 2 rewritten, 3 written
    assert write_sharded_parquet(make, [0, 1, 2, 3], out) == [2, 3]
    got = rd.read_parquet(out).to_pandas().sort_values("v")
    assert list(got["v"]) == list(range(40))
    assert sorted(got["shard"].unique()) == [0, 1, 2, 3]
    # idempotent once complete
    assert write_sharded_parquet(make, [0, 1, 2, 3], out) == []


def test_build_training_corpus_writes_splits(ray_session, tmp_path):
    """The materializing capstone: per-split resumable dirs whose contents
    equal the summary query's counts."""
    import ray.data as rd

    from pholcus_ray.pipelines.corpus import (build_training_corpus,
                                              training_corpus_summary)

    out = str(tmp_path / "corpus")
    assert build_training_corpus(SF, out) == ["train", "val", "test"]
    summary = training_corpus_summary(SF).to_pandas().set_index("split")
    for split in ["train", "val", "test"]:
        got = rd.read_parquet(os.path.join(out, f"split={split}")).to_pandas()
        assert len(got) == summary.loc[split, "n_docs"]
        assert got["n_tokens"].sum() == summary.loc[split, "sum_tokens"]
        assert (got["split"] == split).all()
    # rerun is a no-op (all markers present)
    assert build_training_corpus(SF, out) == []


def test_contamination_check_planted(ray_session, dup_docs_dir):
    """Doc 0 is the eval slice (id % 50 == 0); its exact dup (1) and near
    dups (2, 6) must be flagged with the true shared-gram counts."""
    from pholcus_ray.pipelines.textdata import _tokens, contamination_check

    tb = pq.read_table(os.path.join(dup_docs_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    texts = dict(zip(tb["doc_id"].to_pylist(), tb["text"].to_pylist()))

    def grams(x, n=5):
        t = _tokens(x.lower())
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    ev = grams(texts[0])
    want = {d: len(grams(x) & ev) for d, x in texts.items()
            if d != 0 and len(grams(x) & ev)}
    df = contamination_check(dup_docs_dir).to_pandas()
    got = dict(zip(df["doc_id"], df["n_shared_grams"]))
    assert got == want
    assert got[1] == len(ev)          # exact dup shares every gram
    assert 2 in got and 6 in got      # near dups partially contaminated


def test_multimodal_resize_composes_with_decode(ray_session):
    import ray.data as rd

    from pholcus_ray.stages.multimodal import (DecodeImage, ResizeImage,
                                               synth_image_table)

    t = synth_image_table(40)
    df = (
        rd.from_arrow([t.slice(i, 10) for i in range(0, 40, 10)])
        .map_batches(ResizeImage, batch_format="pyarrow", batch_size=16,
                     concurrency=2)
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=16,
                     concurrency=2)
        .sort("image_id")
        .to_pandas()
    )
    assert len(df) == 40
    # resize caps both sides; decode reads the NEW header dims
    assert (df["decoded_width"] <= 16).all() and (df["decoded_height"] <= 16).all()
    src = t.to_pandas()
    # format tag survives the resize (header contract preserved)
    assert (df["decoded_format"].values == src["format"].values).all()


def _write_docs(d: str, texts: list[str]) -> None:
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))


def _oracle_on(d: str, name: str) -> pd.DataFrame:
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    return con.execute(E.oracle_sql()[name]).df()


def _frames_equal(dfo: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert list(dfo.columns) == list(odf.columns)
    assert len(dfo) == len(odf)
    for c in dfo.columns:
        assert (dfo[c].values == odf[c].values).all(), c


def test_normalize_text_planted(ray_session, tmp_path_factory):
    """NFC folds composed/decomposed to one md5; ASCII whitespace collapses
    and strips; unicode whitespace (NBSP) is deliberately NOT collapsed;
    already-clean docs report changed=False."""
    from pholcus_ray.pipelines.textdata import normalize_text

    d = str(tmp_path_factory.mktemp("normtext"))
    texts = [
        "café",           # composed: already NFC -> unchanged
        "café",          # decomposed: NFC-folds to the same bytes
        "  a\t\nb\f\v  c ",    # ASCII ws runs collapse + ends strip
        "",                    # empty stays empty, unchanged
        "a b",            # NBSP is NOT ASCII ws: untouched
        "clean text",          # unchanged
    ]
    _write_docs(d, texts)
    df = _to_df(normalize_text(d)).sort_values("doc_id").reset_index(drop=True)
    assert df.loc[0, "norm_md5"] == df.loc[1, "norm_md5"] == md5_str("café")
    assert not df.loc[0, "changed"] and df.loc[1, "changed"]
    assert df.loc[2, "norm_md5"] == md5_str("a b c")
    assert df.loc[2, "n_chars_norm"] == 5 and df.loc[2, "changed"]
    assert df.loc[3, "norm_md5"] == md5_str("") and not df.loc[3, "changed"]
    assert df.loc[4, "norm_md5"] == md5_str("a b")
    assert not df.loc[4, "changed"] and not df.loc[5, "changed"]
    _frames_equal(_norm(df), _norm(_oracle_on(d, "normalize_text")))


def test_dedup_against_planted(ray_session, tmp_path_factory):
    """Exact incremental-dedup semantics survive a pathological Bloom:
    bloom_bits=64 forces mass false positives, and the result must still
    equal the exact anti-join (the filter only routes). Incoming-internal
    dups stay is_new (only the PRIOR set gates)."""
    from pholcus_ray.pipelines.textdata import dedup_against

    d = str(tmp_path_factory.mktemp("dedupagainst"))
    texts = [
        "alpha",   # 0 prior
        "alpha",   # 1 inc -> dup
        "beta",    # 2 prior
        "gamma",   # 3 inc -> new
        "delta",   # 4 prior
        "gamma",   # 5 inc -> new (dup only within incoming)
        "epsilon", # 6 prior
        "beta",    # 7 inc -> dup
    ]
    _write_docs(d, texts)
    odf = _norm(_oracle_on(d, "dedup_against"))
    for bits in (64, 1 << 20):
        df = _norm(_to_df(dedup_against(d, bloom_bits=bits)))
        _frames_equal(df, odf)
    got = _to_df(dedup_against(d)).set_index("doc_id")["is_new"]
    assert got.to_dict() == {1: False, 3: True, 5: True, 7: False}


def test_bigram_pmi_planted(ray_session, tmp_path_factory):
    """Hand-computed integer PMI scores, the min_count cut, and the
    (score desc, a, b) tie-break; engine vs oracle on the same corpus."""
    from pholcus_ray.pipelines.textdata import bigram_pmi

    d = str(tmp_path_factory.mktemp("bigrampmi"))
    texts = [
        "x y x y x y",
        "x y x y x y",           # (x,y)=6 (y,x)=4; x=y=6
        "a b a b a b a b a b",   # (a,b)=5 (b,a)=4; a=b=5
        "c c c c c c",           # (c,c)=5; c=6
        "d e d e d e d e d e",   # (d,e)=5 (e,d)=4; d=e=5 -> ties (a,b)
        "",
    ]
    _write_docs(d, texts)
    df = _to_df(bigram_pmi(d)).reset_index(drop=True)
    exp = pd.DataFrame({
        "a": ["a", "d", "x", "c"], "b": ["b", "e", "y", "c"],
        "n_ab": [5, 5, 6, 5], "n_a": [5, 5, 6, 6], "n_b": [5, 5, 6, 6],
        "score": [200000000000, 200000000000, 166666666666, 138888888888],
    })
    for c in exp.columns:
        assert (df[c].values == exp[c].values).all(), c
    odf = _oracle_on(d, "bigram_pmi").reset_index(drop=True)
    _frames_equal(df[sorted(df.columns)], odf[sorted(odf.columns)])


def test_kmeans_fixed_point_exactness(ray_session):
    """The core kmeans_train claim: the distributed run is BIT-identical
    to the sequential single-matrix twin (sizes, integer inertias,
    centroid fingerprints), every row is assigned, and the result is
    deterministic across runs."""
    from pholcus_ray.pipelines.similarity import (kmeans_reference,
                                                  kmeans_train)

    eng = kmeans_train(SF, n_clusters=4, iters=3).to_pydict()
    ref = kmeans_reference(SF, n_clusters=4, iters=3).to_pydict()
    assert eng == ref
    assert sum(eng["size"]) == 500
    assert all(i >= 0 for i in eng["inertia_q"])
    eng2 = kmeans_train(SF, n_clusters=4, iters=3).to_pydict()
    assert eng2 == eng


def test_kmeans_planted_edge_cases(ray_session, tmp_path_factory):
    """Engine == twin on adversarial vectors: exact duplicates, a zero
    vector (normalizes to itself under the 0-norm guard), and
    sign-mirrored values that exercise the half-away-from-zero rounding
    on negative coordinate sums."""
    from pholcus_ray.pipelines.similarity import (kmeans_reference,
                                                  kmeans_train)

    d = str(tmp_path_factory.mktemp("kmplant"))
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 8)).astype(np.float32)
    vecs = np.vstack([base, base[:2],                 # exact dups
                      np.zeros((1, 8), np.float32),   # zero vector
                      -base[:3]])                     # mirrored
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    eng = kmeans_train(d, n_clusters=3, iters=4).to_pydict()
    ref = kmeans_reference(d, n_clusters=3, iters=4).to_pydict()
    assert eng == ref
    assert sum(eng["size"]) == len(vecs)


def test_heavy_hitters_planted(ray_session, tmp_path_factory):
    """Both routes must produce the exact top-k: the sketch path on a
    skewed corpus (n_counters small enough to force per-block MG
    compression), and the checked-bound fallback on a flat corpus where
    every count ties. Ties order by term."""
    from pholcus_ray.pipelines.textdata import heavy_hitters

    d = str(tmp_path_factory.mktemp("hh"))
    # zipf-ish: t0 x 64, t1 x 32, ..., t6 x 1, plus 40 singleton terms
    words = []
    for i in range(7):
        words += [f"t{i}"] * (64 >> i)
    words += [f"rare{i:02d}" for i in range(40)]
    _write_docs(d, [" ".join(words[i::4]) for i in range(4)])

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = con.execute("""
        WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text),
                     '\\s+')) AS term FROM documents WHERE trim(text) <> '')
        SELECT term, COUNT(*) AS cnt FROM tok
        GROUP BY term ORDER BY cnt DESC, term LIMIT 5""").df()

    for m in (8, 4096):   # forced compression vs err=0 sketch path
        got = heavy_hitters(d, k=5, n_counters=m).to_pandas()
        assert (got["term"].values == want["term"].values).all(), m
        assert (got["cnt"].values == want["cnt"].values).all(), m

    # flat corpus + tiny sketch: kth count can't clear the error bound,
    # the exact fallback must engage and still match SQL
    d2 = str(tmp_path_factory.mktemp("hhflat"))
    flat = [f"w{i:03d}" for i in range(60)]
    _write_docs(d2, [" ".join(flat[i::3]) for i in range(3)])
    con2 = duckdb.connect()
    con2.execute("CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{d2}/documents.parquet')")
    want2 = con2.execute("""
        WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text),
                     '\\s+')) AS term FROM documents WHERE trim(text) <> '')
        SELECT term, COUNT(*) AS cnt FROM tok
        GROUP BY term ORDER BY cnt DESC, term LIMIT 10""").df()
    got2 = heavy_hitters(d2, k=10, n_counters=2).to_pandas()
    assert (got2["term"].values == want2["term"].values).all()
    assert (got2["cnt"].values == want2["cnt"].values).all()


def test_temperature_mix_planted(ray_session, tmp_path_factory):
    """The sf corpora have perfectly balanced sources (everything keeps),
    so plant real skew: big=400 docs, small=16 -> keep rates 1.0 and
    sqrt(16/400)=0.2. Checks the integer-square keep rule doc by doc
    against python sqrt, the empirical rates, and the SQL oracle."""
    import hashlib as _h

    from pholcus_ray.pipelines.textdata import temperature_mix

    d = str(tmp_path_factory.mktemp("tempmix"))
    texts, sources = [], []
    for i in range(400):
        texts.append(f"big doc number {i} with some words")
        sources.append("big")
    for i in range(16):
        texts.append(f"small doc number {i} entirely different")
        sources.append("small")
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    df = _to_df(temperature_mix(d))
    n_s = {"big": 400, "small": 16}
    expect = []
    for i, (x, s) in enumerate(zip(texts, sources)):
        u = int(_h.md5(x.encode()).hexdigest()[:5], 16)
        if u * u * 400 < n_s[s] * (1 << 40):
            expect.append(i)
    assert df["doc_id"].tolist() == expect
    kept = df["source"].value_counts()
    assert kept["big"] == 400                      # rate 1.0: keeps all
    assert 0 < kept.get("small", 0) < 16           # rate 0.2 bites
    _frames_equal(_norm(df), _norm(_oracle_on(d, "temperature_mix")))


def test_within_doc_dedup_planted(ray_session, tmp_path_factory):
    """Keep-first semantics on planted repeats: interleaved dups, empty
    lines (dedupable content like any other), single-line and empty
    docs; engine vs oracle on the same data."""
    import hashlib as _h

    from pholcus_ray.pipelines.textdata import within_doc_dedup

    d = str(tmp_path_factory.mktemp("wdd"))
    texts = [
        "a\nb\na\nc\nb\na",        # dups interleaved -> keep a,b,c
        "x\n\n\nx\n",              # empty lines dup too: x,"",x,"" -> x,""
        "only one line",
        "",
        "same\nsame\nsame",
    ]
    _write_docs(d, texts)
    df = _to_df(within_doc_dedup(d)).sort_values("doc_id").reset_index(
        drop=True)
    assert df["n_lines"].tolist() == [6, 5, 1, 1, 3]
    assert df["n_removed"].tolist() == [3, 3, 0, 0, 2]

    def km(lines):
        return _h.md5("".join(
            _h.md5(x.encode()).hexdigest() for x in lines).encode()
        ).hexdigest()

    assert df["kept_md5"].tolist() == [
        km(["a", "b", "c"]), km(["x", ""]), km(["only one line"]),
        km([""]), km(["same"])]
    _frames_equal(_norm(df), _norm(_oracle_on(d, "within_doc_dedup")))


def test_inverted_index_planted(ray_session, tmp_path_factory):
    """Posting-list semantics: within-doc repeats collapse to one
    posting, postings sort by doc_id across partitions, empty docs
    contribute nothing; hand-checked fingerprints + oracle parity."""
    import hashlib as _h

    from pholcus_ray.pipelines.textdata import inverted_index

    d = str(tmp_path_factory.mktemp("invidx"))
    _write_docs(d, ["b a b a", "a c", "", "c a c"])
    df = _to_df(inverted_index(d)).reset_index(drop=True)
    assert df["term"].tolist() == ["a", "b", "c"]
    assert df["df"].tolist() == [3, 1, 2]
    fp = lambda s: _h.md5(s.encode()).hexdigest()
    assert df["postings_md5"].tolist() == [fp("0,1,3"), fp("0"), fp("1,3")]
    _frames_equal(_norm(df), _norm(_oracle_on(d, "inverted_index")))


def test_quantile_buckets_planted(ray_session, tmp_path_factory):
    """Heavy ties straddling bucket boundaries: 7 docs share one length,
    so ROW_NUMBER tie-splitting (doc_id order) must place them in
    DIFFERENT buckets exactly as the SQL window does; plus distinct
    lengths and a hand-checked rank sequence."""
    from pholcus_ray.pipelines.textdata import quantile_buckets

    d = str(tmp_path_factory.mktemp("qbuck"))
    lens = [3, 7, 7, 7, 7, 7, 7, 7, 1, 9, 5, 5]
    _write_docs(d, ["x" * L for L in lens])
    df = _to_df(quantile_buckets(d, k=4)).sort_values("doc_id").reset_index(
        drop=True)
    order = sorted(range(len(lens)), key=lambda i: (lens[i], i))
    want_rank = [0] * len(lens)
    for pos, i in enumerate(order):
        want_rank[i] = pos + 1
    assert df["global_rank"].tolist() == want_rank
    assert df["bucket"].tolist() == [(r - 1) * 4 // len(lens)
                                     for r in want_rank]
    # the 7-tie straddles buckets 1..3: split by doc_id, not lumped
    tie_buckets = df[df["n_chars"] == 7].sort_values("doc_id")["bucket"]
    assert tie_buckets.is_monotonic_increasing and tie_buckets.nunique() > 1

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    import __ray_entry__ as E
    sql = E.oracle_sql()["quantile_buckets"].replace("* 10 //", "* 4 //")
    odf = _norm(con.execute(sql).df())
    _frames_equal(_norm(df), odf)


def test_decode_wav_real_container_exact():
    """DecodeWav parses GENUINE RIFF bytes (stdlib wave) and the features
    are exact on a hand-computed clip."""
    import io
    import wave

    import pyarrow as pa

    from pholcus_ray.stages.multimodal import DecodeWav

    body = np.array([100, -100, 200, -200], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(body.tobytes())
    t = pa.table({"audio_id": pa.array([7], pa.int64()),
                  "payload": pa.array([buf.getvalue()], pa.binary())})
    out = DecodeWav()(t)
    assert out["duration_sec"][0].as_py() == 0.0005
    assert out["rms"][0].as_py() == round(float(np.sqrt(25000.0)), 4)
    assert out["zero_crossings"][0].as_py() == 3


def test_decode_ppm_real_netpbm_exact():
    import pyarrow as pa

    from pholcus_ray.stages.multimodal import DecodePpm, synth_ppm_table

    raster = bytes([0, 0, 0, 255, 255, 255, 10, 20, 30, 40, 50, 60])
    payload = b"P6\n# comment\n2 2\n255\n" + raster
    t = pa.table({"image_id": pa.array([1], pa.int64()),
                  "payload": pa.array([payload], pa.binary())})
    out = DecodePpm()(t)
    assert out["decoded_width"][0].as_py() == 2
    assert out["decoded_height"][0].as_py() == 2
    assert out["decoded_format"][0].as_py() == "ppm"
    assert out["mean_intensity"][0].as_py() == round(
        float(np.frombuffer(raster, np.uint8).mean()), 4)
    # the synthetic table's metadata round-trips through the real parser
    st = synth_ppm_table(8)
    dec = DecodePpm()(st)
    assert dec["decoded_width"].to_pylist() == st["width"].to_pylist()
    assert dec["decoded_height"].to_pylist() == st["height"].to_pylist()


def test_decode_au_real_container_exact():
    """DecodeAu parses GENUINE big-endian .snd headers and the mu-law
    expansion matches hand-computed G.711 values; the synthetic table's
    metadata round-trips through the real parser for both encodings."""
    import struct

    import pyarrow as pa

    from pholcus_ray.stages.multimodal import (DecodeAu, _mulaw_decode,
                                               _mulaw_encode,
                                               synth_au_table)

    # µ-law lattice fixed point: decode∘encode is identity on decodables
    lat = _mulaw_decode(np.arange(256, dtype=np.uint8))
    assert (_mulaw_decode(_mulaw_encode(lat)) == lat).all()
    assert _mulaw_decode(np.array([0xFF], np.uint8))[0] == 0  # +0 code

    body = np.array([100, -100, 200, -200], dtype=np.int16)
    hdr = struct.pack(">4sIIIII", b".snd", 24, 8, 3, 8000, 1)
    t = pa.table({"audio_id": pa.array([7], pa.int64()),
                  "payload": pa.array([hdr + body.astype(">i2").tobytes()],
                                      pa.binary())})
    out = DecodeAu()(t)
    assert out["duration_sec"][0].as_py() == 0.0005
    assert out["rms"][0].as_py() == round(float(np.sqrt(25000.0)), 4)
    assert out["zero_crossings"][0].as_py() == 3

    st = synth_au_table(6)
    dec = DecodeAu()(st)
    for i in range(6):
        sr = st["sample_rate"][i].as_py()
        ns = st["n_samples"][i].as_py()
        assert dec["duration_sec"][i].as_py() == round(ns / sr, 6)


def test_wav_synth_roundtrips_through_real_decoder():
    from pholcus_ray.stages.multimodal import DecodeWav, synth_wav_table

    st = synth_wav_table(6)
    out = DecodeWav()(st)
    for i in range(6):
        sr = st["sample_rate"][i].as_py()
        ns = st["n_samples"][i].as_py()
        assert out["duration_sec"][i].as_py() == round(ns / sr, 6)


def test_bpe_apply_greedy_left_to_right():
    from pholcus_ray.pipelines.textdata import _bpe_apply

    # canonical non-overlapping greedy semantics (Sennrich et al. 2016)
    assert _bpe_apply(list("abab"), "a", "b") == ["ab", "ab"]
    assert _bpe_apply(list("aaa"), "a", "a") == ["aa", "a"]
    assert _bpe_apply(["x", "ab", "c"], "ab", "c") == ["x", "abc"]
    assert _bpe_apply(["dab", "c"], "ab", "c") == ["dab", "c"]  # no substring match
    assert _bpe_apply([], "a", "b") == []
    assert _bpe_apply(["a"], "a", "b") == ["a"]


def test_bpe_merges_bit_identical_to_sequential_twin(ray_session):
    from pholcus_ray.pipelines.textdata import bpe_merges, bpe_reference

    eng = bpe_merges(SF, rounds=5).to_pandas()
    ref = bpe_reference(SF, rounds=5).to_pandas()
    assert eng.equals(ref)
    assert len(eng) == 5
    # counts are monotone non-increasing only within a merge family, but
    # the FIRST merge must be the global most-frequent adjacent pair
    assert eng["pair_count"].iloc[0] >= eng["pair_count"].max()


def test_wordpiece_pure_helpers():
    from pholcus_ray.pipelines.textdata import (_wp_apply, _wp_score_q,
                                                _wp_symbolize)

    assert _wp_symbolize("word") == ["w", "##o", "##r", "##d"]
    assert _wp_symbolize("a") == ["a"]
    # greedy left-to-right non-overlap, merged symbol strips right's ##
    assert _wp_apply(["a", "##b", "##a", "##b"], "a", "##b", "ab") == \
        ["ab", "##a", "##b"]
    assert _wp_apply(["##a", "##a", "##a"], "##a", "##a", "##aa") == \
        ["##aa", "##a"]
    # exact integer quantization: floor(c_p * 1e12 / (c_l * c_r))
    assert _wp_score_q(1, 1, 1) == 10 ** 12
    assert _wp_score_q(2, 3, 5) == (2 * 10 ** 12) // 15
    # c_pair <= min(c_l, c_r) keeps the score inside int64
    assert _wp_score_q(10 ** 9, 10 ** 9, 10 ** 9) == 1000


def test_wordpiece_encoder_greedy_longest_match():
    from pholcus_ray.pipelines.textdata import WordPieceEncoder

    enc = WordPieceEncoder(frozenset(
        ["un", "##aff", "##able", "##ffa", "u", "##n", "##a", "##f",
         "##b", "##l", "##e"]))
    # BERT's canonical example shape: longest prefix piece first
    assert enc.encode_word("unaffable") == ["un", "##aff", "##able"]
    # memo hit returns the same list
    assert enc.encode_word("unaffable") is enc.cache["unaffable"]
    # a word with no decomposition -> [UNK]
    assert enc.encode_word("xyz") == ["[UNK]"]


def test_wordpiece_merges_bit_identical_to_sequential_twin(ray_session):
    from pholcus_ray.pipelines.textdata import (wordpiece_merges,
                                                wordpiece_reference)

    eng = wordpiece_merges(SF, rounds=5).to_pandas()
    ref = wordpiece_reference(SF, rounds=5).to_pandas()
    assert eng.equals(ref)
    assert len(eng) == 5
    # WordPiece's argmax is likelihood, not frequency: every learned
    # merge's quantized score is the round's max by construction; scores
    # are bounded by the 1e12 scale
    assert (eng["score_q"] <= 10 ** 12).all()
    assert (eng["score_q"] > 0).all()
    # merged symbol = left + right without its ## continuation marker
    for _, r in eng.iterrows():
        assert r["merged"] == r["left"] + r["right"][2:]


def test_nn_descent_deterministic_and_structural(ray_session):
    from pholcus_ray.pipelines.similarity import nn_descent

    a = nn_descent(SF, k=5, rounds=2).to_pandas()
    b = nn_descent(SF, k=5, rounds=2).to_pandas()
    # hash-derived init + stated tie-breaks => bit-stable across runs
    assert a.equals(b)
    # exactly k neighbors per vector, ranks 1..k, no self edges
    assert (a.groupby("vec_id").size() == 5).all()
    assert (a.groupby("vec_id")["rank"].max() == 5).all()
    assert (a["vec_id"] != a["neighbor_id"]).all()
    # cos is non-increasing within each vector's list
    for _, g in a.groupby("vec_id"):
        assert (g.sort_values("rank")["cos"].diff().dropna() <= 1e-12).all()


def test_minhash_sql_ctes_match_engine_on_adversarial_docs():
    # the oracle contract on inputs the corpus may never produce: empty,
    # whitespace-only, sub-shingle-length, unicode, repeated tokens
    import duckdb
    import pyarrow as pa

    from pholcus_ray.pipelines.textdata import (
        MinHasher, _sql_minhash_ctes, _sig_matrix)

    texts = ["", "   ", "a", "a b", "a b a b a", "héllo wörld héllo",
             "x y z x y z x y z", "tok"]
    doc_ids = list(range(len(texts)))
    num_perm, bands = 8, 4
    eng = MinHasher(num_perm=num_perm)(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    sig = _sig_matrix(eng["sig"], num_perm)

    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    import __ray_entry__ as E
    ctes = E._ws_trim(_sql_minhash_ctes(num_perm, bands))
    rows = con.execute(
        f"WITH {ctes} SELECT doc_id, perm_id, v FROM mh_sig "
        "ORDER BY doc_id, perm_id").fetchall()
    for doc_id, perm_id, v in rows:
        assert int(sig[doc_id][perm_id]) == int(v), (doc_id, perm_id)


def test_simhash_sql_cte_matches_engine_on_adversarial_docs():
    import duckdb
    import pyarrow as pa

    from pholcus_ray.pipelines.textdata import _simhash64, _sql_simhash_cte

    texts = ["", "   ", "a", "a b", "a a a b", "héllo wörld héllo", "tok"]
    doc_ids = list(range(len(texts)))
    want = _simhash64(texts)

    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    import __ray_entry__ as E
    cte = E._ws_trim(_sql_simhash_cte())
    rows = con.execute(
        f"WITH {cte} SELECT doc_id, simhash FROM simhash_t "
        "ORDER BY doc_id").fetchall()
    for doc_id, sh in rows:
        assert int(want[doc_id]) == int(sh), doc_id


def test_bmp_synth_roundtrips_through_real_decoder():
    import struct

    from pholcus_ray.stages.multimodal import DecodeBmp, synth_bmp_table

    # hand-built 2x2 bottom-up 24-bit BMP with known bytes + row padding
    w, h = 2, 2
    stride = (w * 3 + 3) & ~3  # 8
    rows = [bytes([1, 2, 3, 4, 5, 6]), bytes([7, 8, 9, 10, 11, 12])]
    raster = b"".join(r + b"\x00" * (stride - 6) for r in rows)
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(raster), 2835, 2835, 0, 0)
    parsed_w, parsed_h, px = DecodeBmp._parse(hdr + dib + raster)
    assert (parsed_w, parsed_h) == (2, 2)
    # bottom-up: decoded row 0 is the LAST raster row; padding stripped
    assert px[0].tolist() == [7, 8, 9, 10, 11, 12]
    assert px[1].tolist() == [1, 2, 3, 4, 5, 6]
    assert float(px.mean()) == sum(range(1, 13)) / 12

    st = synth_bmp_table(8)
    dec = DecodeBmp()(st)
    assert dec["decoded_width"].to_pylist() == st["width"].to_pylist()
    assert dec["decoded_height"].to_pylist() == st["height"].to_pylist()


def test_model_scorer_matches_naive_python():
    import hashlib

    import pyarrow as pa

    from pholcus_ray.pipelines.textdata import ModelScorer

    texts = ["hello world hello", "", "   ", "one", "a b c d e f g",
             "héllo wörld", "x " * 500]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = ModelScorer()(t)

    def naive(text):
        toks = text.strip().split()
        total = 0
        for tok in toks:
            j = int.from_bytes(hashlib.md5(tok.encode()).digest()[8:16],
                               "little") % 256
            total += (j * 2654435761) % 1000 - 500
        import math
        mean = math.floor(total / max(len(toks), 1) * 1e6 + 0.5) / 1e6
        return len(toks), total, mean

    for i, text in enumerate(texts):
        n, tot, mean = naive(text)
        assert out["n_tokens"][i].as_py() == n, text
        assert out["score_total"][i].as_py() == tot, text
        assert out["score_mean"][i].as_py() == mean, text


def test_model_score_sql_oracle_parity(ray_session):
    import duckdb

    from pholcus_ray.pipelines.textdata import model_score, model_score_oracle_sql

    got = model_score(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(model_score_oracle_sql()).df()
    assert len(got) == len(want)
    for c in ["doc_id", "n_tokens", "score_total"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["score_mean"].to_numpy() == want["score_mean"].to_numpy()).all()


def test_knn_graph_matches_brute_force_and_bucket_invariant(ray_session):
    import pyarrow.parquet as pq

    from pholcus_ray.pipelines.similarity import (_normalize, _to_matrix,
                                                  knn_graph)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    M = _normalize(_to_matrix(t["embedding"]))
    sims = M @ M.T
    k = 5
    got = knn_graph(SF, k=k, n_buckets=4).to_pandas()
    gb = {v: sub for v, sub in got.groupby("vec_id")}
    for r, vid in enumerate(ids):
        cos = sims[r].copy()
        keep = ids != vid
        order = np.lexsort((ids[keep], -cos[keep]))[:k]
        want_n = ids[keep][order]
        sub = gb[vid]
        assert (sub["neighbor_id"].to_numpy() == want_n).all(), vid
        assert (sub["rank"].to_numpy() == np.arange(1, len(want_n) + 1)).all()
        assert np.allclose(sub["cos"].to_numpy(),
                           np.round(cos[keep][order], 6), atol=2e-6)

    again = knn_graph(SF, k=k, n_buckets=7).to_pandas()
    assert got.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_bpe_encoder_checksum_order_sensitive_and_empty():
    import pyarrow as pa

    from pholcus_ray.pipelines.textdata import BpeEncoder

    enc = BpeEncoder([])
    o1 = enc(pa.table({"doc_id": pa.array([0], pa.int64()),
                       "text": pa.array(["ab ba"], pa.string())}))
    o2 = enc(pa.table({"doc_id": pa.array([0], pa.int64()),
                       "text": pa.array(["ba ab"], pa.string())}))
    # same multiset of symbols, different order -> same count, different hash
    assert o1["n_bpe_tokens"][0].as_py() == o2["n_bpe_tokens"][0].as_py() == 4
    assert o1["enc_hash"][0].as_py() != o2["enc_hash"][0].as_py()
    o3 = enc(pa.table({"doc_id": pa.array([0], pa.int64()),
                       "text": pa.array([""], pa.string())}))
    assert o3["n_bpe_tokens"][0].as_py() == 0
    assert o3["enc_hash"][0].as_py() == 0
    # merges actually apply: (a,b) merge halves the ab-word symbol count
    encm = BpeEncoder([("a", "b")])
    o4 = encm(pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array(["abab"], pa.string())}))
    assert o4["n_bpe_tokens"][0].as_py() == 2


def test_bpe_encode_distributed_matches_sequential_twin(ray_session):
    from pholcus_ray.pipelines.textdata import bpe_encode_parity

    t = bpe_encode_parity(SF).to_pandas()
    assert int(t["parity_ok"].iloc[0]) == 1
    assert int(t["n_docs"].iloc[0]) > 0


def test_pow_range_p61_matches_bigint():
    from pholcus_ray.pipelines.textdata import _pow_range_p61

    P = (1 << 61) - 1
    for r in (1_000_003, 2, P - 1):
        got = _pow_range_p61(r, 70)
        for i in range(70):
            assert int(got[i]) == pow(r, i + 1, P), (r, i)
    assert len(_pow_range_p61(3, 0)) == 0


def test_epoch_shuffle_is_a_permutation_and_bucket_invariant(ray_session):
    from pholcus_ray.pipelines.textdata import epoch_shuffle

    got = epoch_shuffle(SF, seed=0, n_buckets=64).to_pandas()
    n = len(got)
    pos = np.sort(got["pos"].to_numpy())
    assert (pos == np.arange(n)).all()  # exact permutation, no gaps/dups
    assert (got["shard"].to_numpy() == got["pos"].to_numpy() % 8).all()
    assert (got["shard_offset"].to_numpy() == got["pos"].to_numpy() // 8).all()
    # bucket count is an internal knob: same seed => identical order
    again = epoch_shuffle(SF, seed=0, n_buckets=64).to_pandas()
    assert got.reset_index(drop=True).equals(again.reset_index(drop=True))
    # a different seed is a genuinely different permutation
    other = epoch_shuffle(SF, seed=1, n_buckets=64).to_pandas()
    assert (other["pos"].to_numpy() != got["pos"].to_numpy()).any()


def test_data_card_matches_naive_pandas(ray_session):
    import pyarrow.parquet as pq

    from pholcus_ray.pipelines.textdata import _round6, _tokens, data_card

    got = data_card(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "lang", "text"]).to_pandas()
    t["n_toks"] = [len(_tokens(x)) for x in t["text"]]
    t["n_chars_py"] = [len(x) for x in t["text"]]
    m = (t.groupby(["source", "lang"], sort=True)
         .agg(n_docs=("n_toks", "size"), sum_tokens=("n_toks", "sum"),
              sum_chars=("n_chars_py", "sum")).reset_index())
    assert len(got) == len(m)
    assert (got["n_docs"].to_numpy() == m["n_docs"].to_numpy()).all()
    assert (got["sum_tokens"].to_numpy() == m["sum_tokens"].to_numpy()).all()
    assert (got["sum_chars"].to_numpy() == m["sum_chars"].to_numpy()).all()
    total = int(m["n_docs"].sum())
    assert got["pct_docs"].tolist() == [
        _round6(d / total) for d in m["n_docs"]]
    assert got["mean_tokens"].tolist() == [
        _round6(tk / d) for tk, d in zip(m["sum_tokens"], m["n_docs"])]


def test_png_filter_roundtrip_every_filter_type():
    import numpy as np

    from pholcus_ray.stages.multimodal import png_decode, png_encode

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        px = rng.integers(0, 256, size=(11, 9, ch), dtype=np.uint8)
        for f in range(5):  # force each spec filter on every row
            back = png_decode(png_encode(px, filters=[f]))
            assert back.shape == (11, 9, ch)
            assert (back == px).all(), f"filter {f} ch {ch}"
        # mixed per-row filters (the synth default)
        assert (png_decode(png_encode(px)) == px).all()


def test_png_decoder_hand_computed_and_guards():
    import struct
    import zlib

    import numpy as np
    import pytest

    from pholcus_ray.stages.multimodal import (_PNG_SIG, _png_chunk,
                                               png_decode, png_encode)

    # hand-built 2x2 grayscale, filter 0 rows, known bytes
    raw = bytes([0, 10, 20]) + bytes([0, 30, 40])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    p = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IDAT", zlib.compress(raw))
         + _png_chunk(b"IEND", b""))
    px = png_decode(p)
    assert px[:, :, 0].tolist() == [[10, 20], [30, 40]]

    # corrupting one IDAT byte must trip the CRC check
    bad = bytearray(p)
    bad[p.index(b"IDAT") + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))

    # 16-bit / palette / interlaced variants are honestly gated
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    p16 = (_PNG_SIG + _png_chunk(b"IHDR", ihdr16)
           + _png_chunk(b"IDAT", zlib.compress(b"\0" * 10))
           + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        png_decode(p16)

    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JUNK" * 4)

    # synth table flows through the actor-pool stage with exact dims
    from pholcus_ray.stages.multimodal import DecodePng, synth_png_table

    st = synth_png_table(9)
    dec = DecodePng()(st)
    assert dec["decoded_width"].to_pylist() == st["width"].to_pylist()
    assert dec["decoded_height"].to_pylist() == st["height"].to_pylist()
    assert dec["decoded_channels"].to_pylist() == [1, 3, 4] * 3
    # mean_intensity matches an independent decode of the same payloads
    means = [round(float(png_decode(p).mean()), 4)
             for p in st["payload"].to_pylist()]
    assert dec["mean_intensity"].to_pylist() == means


def test_gif_encode_decode_roundtrip_and_interlace():
    import numpy as np

    from pholcus_ray.stages.multimodal import gif_decode, gif_encode

    rng = np.random.default_rng(11)
    for ncol in (4, 16, 250):
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=(17, 23), dtype=np.uint8)
        for il in (False, True):
            px, got_ncol, got_il = gif_decode(gif_encode(idx, pal, il))
            assert got_il == il
            assert (px == pal[idx]).all(), (ncol, il)
    # KwKwK / repetitive content exercises first-use codes + table growth
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = np.tile(np.array([[1, 1, 1, 2], [2, 1, 1, 1]], np.uint8), (40, 60))
    px, _, _ = gif_decode(gif_encode(idx, pal))
    assert (px == pal[idx]).all()


def test_gif_decoder_reads_third_party_files():
    """The decoder must read GIFs written by OTHER encoders — CPython ships
    real icons (idlelib), including interlaced ones."""
    import glob
    import os

    import pytest

    from pholcus_ray.stages.multimodal import gif_decode

    icons = os.path.join(os.path.dirname(os.__file__), "idlelib", "Icons")
    files = sorted(glob.glob(os.path.join(icons, "*.gif")))
    if not files:
        pytest.skip("no idlelib icons in this python")
    seen_interlaced = False
    for f in files:
        px, ncol, il = gif_decode(open(f, "rb").read())
        h, w, ch = px.shape
        assert ch == 3 and w > 0 and h > 0 and 2 <= ncol <= 256
        seen_interlaced |= il
        base = os.path.basename(f)
        for mark in ("16", "32", "48"):
            if mark in base:
                assert (w, h) == (int(mark), int(mark)), base
    assert seen_interlaced  # folder.gif/openfolder.gif are interlaced


def test_gif_stage_and_synth_table():
    from pholcus_ray.stages.multimodal import (DecodeGif, gif_decode,
                                               synth_gif_table)

    st = synth_gif_table(9)
    dec = DecodeGif()(st)
    assert dec["decoded_width"].to_pylist() == st["width"].to_pylist()
    assert dec["decoded_height"].to_pylist() == st["height"].to_pylist()
    means = [round(float(gif_decode(p)[0].mean()), 4)
             for p in st["payload"].to_pylist()]
    assert dec["mean_intensity"].to_pylist() == means


def test_lm_perplexity_planted(ray_session, tmp_path_factory):
    """Planted fixture: the bigram LM trains on repeated clean English
    (lang=en); an in-distribution doc scores low perplexity, a
    shuffled-gibberish doc scores high, a 1-token doc drops (no
    transitions), and a non-en doc is scored but never trained on.
    Engine vs oracle bit-for-bit on every column."""
    import __ray_entry__ as E

    d = tmp_path_factory.mktemp("lmppl")
    clean_sents = ["the cat sat on the mat and the dog ran to the park",
                   "the dog sat on the mat and the cat ran to the house",
                   "a cat and a dog sat on the mat in the house"]
    gibberish = "mat the park to ran house dog on cat sat a and the in"
    texts = clean_sents + [clean_sents[0], gibberish, "word",
                           "el gato y el perro"]
    langs = ["en"] * 4 + ["en", "en", "es"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))

    df = _to_df(E.queries()["lm_perplexity"](str(d))).set_index("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = con.execute(E.oracle_sql()["lm_perplexity"]).df() \
        .set_index("doc_id")
    for c in df.columns:
        assert (df[c] == odf[c]).all(), (c, df[c].tolist(), odf[c].tolist())
    # in-distribution repeat scores better than shuffled gibberish
    assert df.loc[3, "mean_nll"] < df.loc[4, "mean_nll"]
    # 1-token doc: no transitions, keep=False on both engines
    assert df.loc[5, "n_transitions"] == 0 and not bool(df.loc[5, "keep"])
    # the es doc is scored (has transitions) though never trained on
    assert df.loc[6, "n_transitions"] == 4


def test_dhash_invariances_and_phash_dups(ray_session):
    import numpy as np

    from pholcus_ray.stages.multimodal import (dhash64, image_phash_dups,
                                               synth_phash_corpus,
                                               png_decode)

    # gray vs RGB-replicated image hash identically (BT.601 of r=g=b is r)
    from pholcus_ray.stages.multimodal import _phash_base_small

    rng = np.random.default_rng(2)
    g = _phash_base_small(rng)
    assert (np.abs(np.diff(g, axis=1)) >= 8).all()
    big = np.kron(g, np.ones((4, 4), dtype=np.int64)).astype(np.uint8)
    assert dhash64(big) == dhash64(np.repeat(big[:, :, None], 3, axis=2))
    # small noise does not move the hash (block means absorb +-2)
    noisy = np.clip(big.astype(np.int64)
                    + rng.integers(-2, 3, size=big.shape), 0, 255)
    assert dhash64(big) == dhash64(noisy.astype(np.uint8))
    # a strong local edit to block (0,0) flips exactly bit 0: that block
    # participates only in the g[0,1] > g[0,0] comparison
    edited = big.copy()
    if g[0, 1] > g[0, 0]:      # bit was 1: raise the left block above it
        edited[0:4, 0:4] = 255
    else:                      # bit was 0: drop the left block below it
        assert g[0, 1] >= 8
        edited[0:4, 0:4] = g[0, 1] - 8
    assert (dhash64(big) ^ dhash64(edited.astype(np.uint8))) == 1

    # planted ground truth holds: every copy is within hamming<=3 of base
    t = synth_phash_corpus(60)
    hs = {i: dhash64(png_decode(p)) for i, p in
          zip(t["image_id"].to_pylist(), t["payload"].to_pylist())}
    n_planted = 0
    for i, d in zip(t["image_id"].to_pylist(), t["dup_of"].to_pylist()):
        if d >= 0:
            n_planted += 1
            assert bin(hs[i] ^ hs[d]).count("1") <= 3, (i, d)
    assert n_planted > 5

    # the full verdict query: banding complete, planted pairs recovered
    v = image_phash_dups("unused", n_images=120)
    assert v.to_pylist() == [
        {"n_images": 120, "complete": 1, "planted_ok": 1}]


def test_uni_viterbi_dp_and_tiebreak():
    from pholcus_ray.pipelines.textdata import _uni_viterbi

    # 'abc' with strong 'ab': split ab|c beats a|b|c and a|bc
    scores = {"a": -5_000_000_000, "b": -5_000_000_000,
              "c": -5_000_000_000, "ab": -3_000_000_000,
              "bc": -9_000_000_000}
    assert _uni_viterbi("abc", scores) == ["ab", "c"]
    # exact tie between a|b and ab: the DP takes the SHORTEST last
    # piece first under strict >, so a|b (last piece 'b') wins
    scores = {"a": -1_000_000_000, "b": -1_000_000_000,
              "ab": -2_000_000_000}
    assert _uni_viterbi("ab", scores) == ["a", "b"]
    # missing char: degrades to char split (coverage fallback)
    assert _uni_viterbi("xy", {"x": -1}) == ["x", "y"]


def test_unigram_lm_learns_and_matches_twin(ray_session):
    from pholcus_ray.pipelines.textdata import (_uni_scores, _uni_viterbi,
                                                unigram_lm,
                                                unigram_reference)

    sf = "/root/testdata/sf0.001"
    eng = unigram_lm(sf)
    ref = unigram_reference(sf)
    assert eng.to_pydict() == ref.to_pydict()
    counts = dict(zip(eng["piece"].to_pylist(), eng["count"].to_pylist()))
    multi = {p for p in counts if len(p) > 1}
    assert len(multi) > 10  # real multi-char pieces survive EM
    # the trained model compresses: a frequent corpus word segments into
    # fewer pieces than characters
    scores = _uni_scores(counts)
    seg = _uni_viterbi("column", scores)
    assert "".join(seg) == "column" and len(seg) < len("column")


def test_unigram_encode_compresses_and_matches_twin(ray_session):
    from pholcus_ray.pipelines.textdata import (unigram_encode,
                                                unigram_encode_reference)

    sf = "/root/testdata/sf0.001"
    eng = _to_df(unigram_encode(sf)).reset_index(drop=True)
    ref = unigram_encode_reference(sf).to_pandas()
    assert eng.equals(ref)
    # the learned vocab compresses: fewer pieces than characters overall,
    # but at least one piece per word
    assert (eng["n_pieces"] >= eng["n_words"]).all()
    docs = pq.read_table(os.path.join(sf, "documents.parquet"),
                         columns=["text"])
    n_chars_nospace = sum(len(t.replace(" ", ""))
                          for t in docs["text"].to_pylist())
    assert eng["n_pieces"].sum() < n_chars_nospace * 0.6


def test_kll_sketch_certificate_exact_on_adversarial_orders():
    """The KLL sketch's self-certified rank bound must hold EXACTLY (not
    probabilistically — the compaction rule is deterministic) on sorted,
    reverse-sorted and all-equal streams, with tiny k forcing many
    compactions; weight conservation is exact at every step."""
    from pholcus_ray.pipelines.textdata import _kll_insert, _kll_rank

    rng = np.random.default_rng(7)
    streams = {
        "sorted": np.arange(10_000, dtype=np.int64),
        "reversed": np.arange(10_000, dtype=np.int64)[::-1],
        "const": np.zeros(10_000, dtype=np.int64),
        "shuffled": rng.permutation(10_000).astype(np.int64),
    }
    for name, xs in streams.items():
        levels: dict = {}
        err = 0
        for chunk in np.array_split(xs, 13):   # uneven partials, like blocks
            err += _kll_insert(levels, 32, chunk)
        w = sum((1 << lvl) * len(buf) for lvl, buf in levels.items())
        assert w == len(xs), name
        assert err > 0 or name == "const" or len(xs) <= 32
        exact_sorted = np.sort(xs)
        for v in (0, 123, 5000, 9999):
            est = _kll_rank(levels, v)
            exact = int(np.searchsorted(exact_sorted, v, side="right"))
            assert abs(est - exact) <= err, (name, v, est, exact, err)


def test_kll_query_bound_ok_at_sf0001(ray_session):
    from pholcus_ray.pipelines.textdata import kll_quantiles_check

    out = kll_quantiles_check(SF, k=64).to_pandas()
    assert int(out["weight_ok"].iloc[0]) == 1
    assert int(out["bound_ok"].iloc[0]) == 1
    assert int(out["n_values"].iloc[0]) > 0


def _esd_naive(texts: dict[int, str], L: int):
    """Brute-force ExactSubstr spec: global keep-first by (doc_id, pos),
    union the dup windows, cut the spans."""
    import hashlib
    seen: set = set()
    marks: dict[int, list[int]] = {d: [] for d in texts}
    for did in sorted(texts):
        t = texts[did]
        for p in range(max(len(t) - L + 1, 0)):
            w = t[p:p + L]
            if w in seen:
                marks[did].append(p)
            else:
                seen.add(w)
    out = {}
    for did in sorted(texts):
        t = texts[did]
        cut = np.zeros(len(t), bool)
        for p in marks[did]:
            cut[p:p + L] = True
        kept = "".join(c for c, m in zip(t, cut) if not m)
        out[did] = (len(t), int(cut.sum()), hashlib.md5(
            kept.encode()).hexdigest())
    return out


def test_exact_substring_dedup_planted_vs_bruteforce(ray_session,
                                                     tmp_path_factory):
    from pholcus_ray.pipelines.textdata import exact_substring_dedup

    d = tmp_path_factory.mktemp("esd")
    passage = ("the shared boilerplate passage that repeats verbatim "
               "across documents zero one and two exactly")
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts = {
        0: "u " + passage + " tail zero",            # first occurrence: kept
        1: "doc one prefix " + passage + " suffix",  # span removed
        2: passage + " middle filler " + passage,    # self-repeat: 2nd cut
        3: " ".join(rng.choice(words, 60)),
        4: "short",                                   # < L: untouched
    }
    texts[5] = texts[3]                               # exact dup of 3
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(texts[k]) for k in sorted(texts)],
                            pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))

    L = 40
    got = _to_df(exact_substring_dedup(str(d), L=L)).set_index("doc_id")
    want = _esd_naive(texts, L)
    for did, (n, rm, h) in want.items():
        assert int(got.loc[did, "n_chars"]) == n
        assert int(got.loc[did, "n_removed"]) == rm, did
        assert got.loc[did, "dedup_md5"] == h, did
    # the planted structure actually exercised removal
    assert int(got.loc[0, "n_removed"]) == 0
    assert int(got.loc[1, "n_removed"]) >= len(passage)
    assert int(got.loc[2, "n_removed"]) >= len(passage)
    assert int(got.loc[4, "n_removed"]) == 0
    assert int(got.loc[5, "n_removed"]) == len(texts[3])


def test_exact_substring_dedup_random_matches_bruteforce(ray_session,
                                                         tmp_path_factory):
    """Randomized cross-check on a corpus built to stress overlaps:
    small alphabet so long repeats arise naturally, plus grafted
    passages with partial overlap between docs."""
    from pholcus_ray.pipelines.textdata import exact_substring_dedup

    d = tmp_path_factory.mktemp("esdrand")
    rng = np.random.default_rng(23)
    base = "".join(rng.choice(list("abc "), 400))
    texts = {}
    for i in range(12):
        s = int(rng.integers(0, 300))
        e = s + int(rng.integers(30, 100))
        graft = base[s:e]
        noise = "".join(rng.choice(list("abcdefgh "), 80))
        texts[i] = noise[:40] + graft + noise[40:]
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(texts[k]) for k in sorted(texts)],
                            pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    L = 24
    got = _to_df(exact_substring_dedup(str(d), L=L)).set_index("doc_id")
    want = _esd_naive(texts, L)
    assert int(got["n_removed"].sum()) > 0
    for did, (n, rm, h) in want.items():
        assert (int(got.loc[did, "n_chars"]),
                int(got.loc[did, "n_removed"]),
                got.loc[did, "dedup_md5"]) == (n, rm, h), did


def test_kmv_distinct_matches_bruteforce(ray_session):
    """KMV at a small k on real sf0.001 events: the distributed
    bottom-k merge must equal the single-pass brute-force sketch
    (bottom-k of ALL distinct hashes), including the estimator and
    the sample checksum."""
    from pholcus_ray.functions.hashing import md5_lower64_array
    from pholcus_ray.pipelines.textdata import kmv_distinct_check

    K = 32
    out = kmv_distinct_check(SF, k=K, max_err_pct=60).to_pandas() \
        .set_index("event_type")
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["event_type", "user_id"]).to_pandas()
    assert len(out) > 0
    for ty, g in ev.groupby("event_type"):
        h = np.unique(md5_lower64_array(
            [f"u{u}" for u in g["user_id"].to_numpy()]))
        bk = np.sort(h)[:K]
        nd = len(h)
        est = nd if nd < K else (K - 1) * (1 << 64) // int(bk[-1])
        assert int(out.loc[ty, "n_kept"]) == min(nd, K)
        assert int(out.loc[ty, "n_users_est"]) == est
        assert int(out.loc[ty, "sketch_sum"]) == \
            int(bk.sum(dtype=object)) % (1 << 61)


def test_kmv_exact_below_k(ray_session):
    """When every type has fewer than k distinct users the estimate IS
    the exact count and within_ok is trivially 1."""
    from pholcus_ray.pipelines.textdata import kmv_distinct_check

    out = kmv_distinct_check(SF, k=1 << 20).to_pandas()
    assert (out["within_ok"] == 1).all()
    assert (out["n_users_est"] == out["n_kept"]).all()


def _winnow_naive(text: str, k: int, w: int):
    """Spec-literal robust winnowing: per window, min hash with
    rightmost tie-break; fingerprint = set of selected positions."""
    from pholcus_ray.functions.hashing import md5_lower64_array

    G = len(text) - k + 1
    if G <= 0:
        return []
    h = md5_lower64_array([text[i:i + k] for i in range(G)])
    sel = set()
    for q in range(max(G - w, 0) + 1):
        win = range(q, min(q + w, G))
        best = min(win, key=lambda p: (int(h[p]), -p))
        sel.add(best)
    return sorted((p, int(h[p])) for p in sel)


def test_winnowing_matches_bruteforce_and_guarantee(ray_session,
                                                    tmp_path_factory):
    from pholcus_ray.pipelines.textdata import winnowing_fp

    d = tmp_path_factory.mktemp("winnow")
    rng = np.random.default_rng(7)
    shared = "the identical plagiarised sentence lives here verbatim"
    texts = {
        0: "prefix zero " + shared + " suffix zero",
        1: "completely different lead-in then " + shared + " trailing",
        2: "".join(rng.choice(list("abcdefg "), 200)),
        3: "tiny",                                   # < k chars: no grams
        4: "".join(rng.choice(list("abcdefg "), 120)),
    }
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(texts[i]) for i in sorted(texts)],
                            pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    k, w = 8, 16
    got = _to_df(winnowing_fp(str(d), k=k, w=w)).set_index("doc_id")
    for did, text in texts.items():
        fps = _winnow_naive(text, k, w)
        assert int(got.loc[did, "n_grams"]) == max(len(text) - k + 1, 0)
        assert int(got.loc[did, "n_fp"]) == len(fps), did
        x = 0
        for _, hv in fps:
            x ^= hv
        assert int(got.loc[did, "fp_xor"]) == (x & 0x7FFFFFFFFFFFFFFF), did
    # Schleimer guarantee: len(shared) >= w + k - 1 chars shared between
    # docs 0 and 1 => at least one shared fingerprint on BOTH docs.
    assert len(shared) >= w + k - 1
    assert int(got.loc[0, "n_shared_fp"]) >= 1
    assert int(got.loc[1, "n_shared_fp"]) >= 1
    assert int(got.loc[3, "n_fp"]) == 0


def test_ngram_containment_asymmetric_inclusion(ray_session,
                                                tmp_path_factory):
    """A short doc quoted inside a much longer one: containment flags the
    ordered pair (short -> long) that symmetric Jaccard misses."""
    import os
    d = str(tmp_path_factory.mktemp("containdocs"))
    short = "the quick brown fox jumps over the lazy dog"
    long = (short + " and then wanders far beyond the riverbank through "
            "tall grass fields whistling quietly all the way home again "
            "under a violet sky full of unfamiliar constellations")
    texts = {0: short, 1: long, 2: "zzz qqq xxx totally unrelated vvv"}
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(texts[k]) for k in sorted(texts)],
                            pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    from pholcus_ray.pipelines.textdata import (ngram_containment,
                                                ngram_jaccard_exact)

    cont = ngram_containment(d, threshold=0.9).to_pandas()
    got = set(zip(cont["a"], cont["b"]))
    assert (0, 1) in got          # short contained in long
    assert (1, 0) not in got      # long NOT contained in short
    assert not any(2 in p for p in got)
    jac = ngram_jaccard_exact(d, threshold=0.9).to_pandas()
    # Jaccard misses the inclusion pair entirely (empty result here)
    assert len(jac) == 0 or not ((jac["a"] == 0) & (jac["b"] == 1)).any()


def test_sniff_mime_pure():
    from pholcus_ray.stages.multimodal import sniff_mime

    assert sniff_mime(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wav"
    # RIFF without WAVE form type is NOT wav (e.g. RIFF/AVI)
    assert sniff_mime(b"RIFF\x00\x00\x00\x00AVI LIST") == \
        "application/octet-stream"
    assert sniff_mime(b".snd\x00\x00\x00\x18") == "audio/basic"
    assert sniff_mime(b"P6\n4 4\n255\n") == "image/x-portable-pixmap"
    assert sniff_mime(b"BM\x00\x00") == "image/bmp"
    assert sniff_mime(b"\x89PNG\r\n\x1a\n") == "image/png"
    assert sniff_mime(b"GIF87a") == "image/gif"
    assert sniff_mime(b"GIF89a") == "image/gif"
    assert sniff_mime(b"") == "application/octet-stream"
    assert sniff_mime(b"\xffhello") == "application/octet-stream"


def test_tfidf_cosine_topk_planted(ray_session, pii_docs_dir):
    """Engine vs oracle on the planted corpus (ties, empty docs, dup
    texts), symmetry of the pair dots, and a hand-checkable neighbor:
    identical documents must be each other's top match at the maximum
    quantized cosine (~1e12)."""
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import tfidf_cosine_topk

    df = _norm(_to_df(tfidf_cosine_topk(pii_docs_dir)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["tfidf_cosine_topk"]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c
    # sim is symmetric where both directions survive the top-k cut
    pairs = {(r.src, r.dst): r.sim_q for r in df.itertuples()}
    for (a, b), s in pairs.items():
        if (b, a) in pairs:
            assert pairs[(b, a)] == s
    # empty/whitespace docs (4, 5) have no vector -> no rows
    assert not set(df["src"]).intersection({4, 5})
    # self-pairs never emitted
    assert (df["src"] != df["dst"]).all()


def test_tfidf_cosine_topk_identical_docs_max_sim(ray_session,
                                                  tmp_path_factory):
    from pholcus_ray.pipelines.textdata import tfidf_cosine_topk

    d = tmp_path_factory.mktemp("cosdocs")
    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "epsilon zeta", "alpha beta something else entirely here"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    df = _to_df(tfidf_cosine_topk(d))
    top0 = df[df["src"] == 0].iloc[0]
    assert top0["dst"] == 1
    # identical unit vectors: dot = sum u_i^2 with u quantized to 1e6
    # scale — within 1e-6 of the exact 1e12 ceiling
    assert abs(int(top0["sim_q"]) - 10 ** 12) <= 10 ** 7


def test_varint_codec_vectorized_roundtrip():
    from pholcus_ray.pipelines.textdata import (_varint_decode,
                                                _varint_encode)

    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2097151, 2097152,
                     268435455, 268435456, 34359738367, 34359738368,
                     562949953421311, 562949953421312,
                     (1 << 56) - 1], dtype=np.int64)
    buf, nbytes = _varint_encode(vals)
    # canonical LEB128 sizes
    assert nbytes.tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6,
                               7, 8, 8]
    assert len(buf) == int(nbytes.sum())
    dec = _varint_decode(buf)
    assert (dec == vals).all()
    # continuation bits: last byte of each value has high bit clear
    ends = np.cumsum(nbytes) - 1
    assert ((buf[ends] & 0x80) == 0).all()
    mid = np.setdiff1d(np.arange(len(buf)), ends)
    assert ((buf[mid] & 0x80) == 0x80).all()
    # single-byte spot check: 300 = 0xAC 0x02 (the canonical example)
    b2, _ = _varint_encode(np.array([300], dtype=np.int64))
    assert b2.tolist() == [0xAC, 0x02]


@given(st.lists(st.integers(min_value=0, max_value=(1 << 56) - 1),
                min_size=0, max_size=200))
@settings(max_examples=50, deadline=None)
def test_varint_codec_property(vals):
    from pholcus_ray.pipelines.textdata import (_varint_decode,
                                                _varint_encode)

    arr = np.array(vals, dtype=np.int64)
    buf, nbytes = _varint_encode(arr)
    assert (_varint_decode(buf) == arr).all()
    assert len(buf) == int(nbytes.sum())


def test_postings_codec_planted(ray_session, pii_docs_dir):
    import __ray_entry__ as E
    from pholcus_ray.pipelines.textdata import postings_codec

    df = _norm(_to_df(postings_codec(pii_docs_dir)))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pii_docs_dir}/documents.parquet')")
    odf = _norm(con.execute(E.oracle_sql()["postings_codec"]).df())
    assert list(df.columns) == list(odf.columns)
    assert len(df) == len(odf)
    for c in df.columns:
        assert df[c].dtype == odf[c].dtype, c
        assert (df[c].values == odf[c].values).all(), c
    assert (df["roundtrip_ok"] == 1).all()
    # "spam" appears only in doc 2: df=1, first-raw gap 2 -> 1 byte
    spam = df[df["token"] == "spam"].iloc[0]
    assert spam["df"] == 1 and spam["bytes_compressed"] == 1
    assert spam["doc_xor"] == 2


def test_pack_bins_ffd_invariants_and_parity(ray_session, tmp_path_factory):
    from pholcus_ray.pipelines.textdata import (pack_bins_ffd,
                                                pack_bins_parity,
                                                pack_bins_reference)

    d = tmp_path_factory.mktemp("packdocs")
    # lengths chosen to exercise: exact fit, first-fit skipping a too-
    # full bin, oversize, empty
    texts = ["w " * 100, "w " * 60, "w " * 40, "w " * 28, "w " * 28,
             "w " * 200, "", "w " * 128, "w " * 1]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([x.strip() for x in texts], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    # single partition so the FFD order is the global decreasing order
    eng = _to_df(pack_bins_ffd(str(d), seq_len=128, num_parts=1)) \
        .sort_values("doc_id").reset_index(drop=True)
    ref = pack_bins_reference(str(d), seq_len=128, num_parts=1) \
        .to_pandas()
    assert eng.equals(ref)
    by = eng.set_index("doc_id")
    assert by.loc[5, "status"] == 2 and by.loc[5, "bin_id"] == -1  # 200w
    assert by.loc[6, "status"] == 0                                # empty
    # FFD order: 128 -> bin0 full; 100 -> bin1; 60 -> bin2; 40 -> bin2
    # (100+40 > 128 skips bin1? no: bin1 has 100, residual 28 < 40 ->
    # bin2 with 60, residual 68 >= 40 fits); 28 -> bin1 (first fit!);
    # 28 -> bin2 (68-40=28 fits exactly); 1 -> bin2? residual 0 -> bin3
    assert by.loc[7, "bin_id"] == 0 and by.loc[7, "bin_fill"] == 128
    assert by.loc[0, "bin_id"] == 1
    assert by.loc[1, "bin_id"] == 2
    assert by.loc[2, "bin_id"] == 2
    assert by.loc[3, "bin_id"] == 1 and by.loc[3, "bin_fill"] == 128
    assert by.loc[4, "bin_id"] == 2 and by.loc[4, "bin_fill"] == 128
    assert by.loc[8, "bin_id"] == 3 and by.loc[8, "bin_fill"] == 1
    # capacity + whole-doc invariants via the parity verdict
    v = pack_bins_parity(str(d), seq_len=128, num_parts=1).to_pandas()
    assert v["parity_ok"].iloc[0] == 1
    assert v["n_packed"].iloc[0] == 7
    assert v["n_oversize"].iloc[0] == 1 and v["n_empty"].iloc[0] == 1


def test_pack_bins_ffd_partitioned_determinism(ray_session):
    from pholcus_ray.pipelines.textdata import (pack_bins_ffd,
                                                pack_bins_reference)

    sf = "/root/testdata/sf0.001"
    eng = _to_df(pack_bins_ffd(sf)).sort_values("doc_id") \
        .reset_index(drop=True)
    ref = pack_bins_reference(sf).to_pandas()
    assert eng.equals(ref)
    packed = eng[eng["status"] == 1]
    fills = packed.groupby("bin_id")["n_tokens"].sum()
    assert (fills <= 128).all()
    # decent utilization on the sf corpus: mean fill >= 60% of capacity
    assert fills.mean() >= 0.6 * 128


def test_weighted_sample_bias_and_determinism(ray_session):
    from pholcus_ray.pipelines.textdata import weighted_sample

    sf = "/root/testdata/sf0.001"
    a = _to_df(weighted_sample(sf, k=50)).reset_index(drop=True)
    b = _to_df(weighted_sample(sf, k=50)).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 50
    # keys strictly ordered desc (md5-derived ties are ~impossible but
    # the doc_id tie-break keeps even those deterministic)
    assert (a["key_femto"].diff().dropna() <= 0).all()
    # weighted bias: the sample's mean doc length exceeds the corpus
    # mean (long docs are preferentially drawn under w = n_chars)
    corpus = pq.read_table(f"{sf}/documents.parquet",
                           columns=["n_chars"]).to_pandas()
    assert a["n_chars"].mean() > corpus["n_chars"].mean()


def test_mirror_hosts_planted_mirror_pair(ray_session, tmp_path_factory):
    from pholcus_ray.pipelines.textdata import mirror_hosts

    d = tmp_path_factory.mktemp("mirrordocs")
    # hostA and hostB serve the same site (different doc split, same
    # shingle set); hostC is unrelated; hostD half-overlaps A
    texts = [("hostA", "the quick brown fox jumps over the lazy dog"),
             ("hostB", "the quick brown fox jumps over the lazy dog"),
             ("hostC", "completely different content lives here now"),
             ("hostD", "the quick brown fox eats something else today")]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([x for _, x in texts], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array([s for s, _ in texts], pa.string()),
        "n_chars": pa.array([len(x) for _, x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    df = _to_df(mirror_hosts(str(d))).set_index(["source_a", "source_b"])
    ab = df.loc[("hostA", "hostB")]
    assert ab["jaccard_micro"] == 1_000_000 and ab["is_mirror"] == 1
    assert ab["n_common"] == ab["n_a"] == ab["n_b"]
    ad = df.loc[("hostA", "hostD")]
    assert 0 < ad["jaccard_micro"] < 500_000 and ad["is_mirror"] == 0
    # disjoint pair never appears (no shared shingle)
    assert ("hostB", "hostC") not in df.index \
        and ("hostA", "hostC") not in df.index


def test_retrieval_eval_known_item(ray_session, tmp_path_factory):
    """A doc whose salient (tf-dominant, rare) term is unique must
    retrieve itself at rank 1; two docs sharing a dominant term split
    ranks 1 and 2 under the BM25 saturation."""
    from pholcus_ray.pipelines.textdata import retrieval_eval

    d = tmp_path_factory.mktemp("irdocs")
    texts = [
        "zebra zebra alpha beta",
        "quokka quokka filler words here",
        "shared shared tail",
        "shared shared shared shared padding tokens making this one "
        "much longer than the short shared doc indeed",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    df = _to_df(retrieval_eval(str(d), n_queries=4)) \
        .set_index("query_doc")
    assert df.loc[0, "token"] == "zebra"
    assert df.loc[0, "self_rank"] == 1 and df.loc[0, "rr_micro"] == 1_000_000
    assert df.loc[1, "token"] == "quokka" and df.loc[1, "self_rank"] == 1
    # docs 2 and 3 both query 'shared' (tf-dominant in each); candidate
    # set is exactly the two of them; ranks are a permutation of {1, 2}
    assert df.loc[2, "token"] == "shared" == df.loc[3, "token"]
    assert df.loc[2, "n_candidates"] == 2 == df.loc[3, "n_candidates"]
    assert sorted([df.loc[2, "self_rank"], df.loc[3, "self_rank"]]) == [1, 2]
    for q in (2, 3):
        assert df.loc[q, "rr_micro"] == 1_000_000 // df.loc[q, "self_rank"]


def test_ngram_novelty_ordering_rule(ray_session, tmp_path_factory):
    """doc 0 is always fully novel; an exact copy later is fully
    non-novel; a half-overlapping doc scores in between."""
    from pholcus_ray.pipelines.textdata import ngram_novelty

    d = tmp_path_factory.mktemp("novdocs")
    texts = [
        "a b c d e f",          # 4 trigrams, all first
        "a b c d e f",          # exact copy: 0 novel
        "a b c x y z w",        # 'a b c' seen; 4 of 5 novel
        "",                     # gramless
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    df = _to_df(ngram_novelty(str(d))).set_index("doc_id")
    assert df.loc[0, "novelty_micro"] == 1_000_000
    assert df.loc[1, "n_novel"] == 0 and df.loc[1, "novelty_micro"] == 0
    assert df.loc[2, "n_grams"] == 5 and df.loc[2, "n_novel"] == 4
    assert df.loc[2, "novelty_micro"] == 800_000
    assert df.loc[3, "n_grams"] == 0 and df.loc[3, "novelty_micro"] == 0


def test_compression_quality_failure_modes(ray_session, tmp_path_factory):
    """Repetitive text compresses below the keep band; random-ish blobs
    sit above natural text; normal prose lands inside."""
    from pholcus_ray.pipelines.textdata import compression_quality

    d = tmp_path_factory.mktemp("zqdocs")
    import base64
    import hashlib
    blob = base64.b85encode(b"".join(
        hashlib.sha256(str(i).encode()).digest()
        for i in range(64))).decode()
    texts = [
        ("spam " * 400).strip(),                       # hyper-repetitive
        "The quick brown fox jumps over the lazy dog. "
        "It was the best of times, it was the worst of times; "
        "a tale of two cities follows many threads through history "
        "and revolution with long natural sentences and varied words.",
        blob,                                           # high-entropy hex
        "",                                             # empty -> dropped
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    df = _to_df(compression_quality(str(d))).set_index("doc_id")
    assert 3 not in df.index                     # empty dropped
    assert df.loc[0, "ratio_micro"] < 250_000    # repetition
    assert df.loc[0, "keep"] == 0
    assert 250_000 <= df.loc[1, "ratio_micro"] <= 800_000
    assert df.loc[1, "keep"] == 1
    assert df.loc[2, "ratio_micro"] > 800_000   # high-entropy blob
    assert df.loc[2, "keep"] == 0
    # ratio arithmetic is the stated integer form
    assert (df["ratio_micro"]
            == df["zlib_bytes"] * 1_000_000 // df["raw_bytes"]).all()


def test_corpus_seq_checksums_vector_parity():
    """The partition-vectorized segment checksum must be bit-identical to
    the scalar per-sequence fold it replaced (capstone verify stages)."""
    import random

    from pholcus_ray.pipelines.corpus import (_ts_seq_checksums,
                                              _ts_sym_checksum)

    rnd = random.Random(7)
    segs = []
    for _ in range(40):
        n = rnd.choice([0, 1, 2, 5, 97, 256])
        segs.append([rnd.choice(["a", "th", "qu", "xyz", "e"])
                     for _ in range(n)])
    flat = [s for seg in segs for s in seg]
    lens = np.array([len(s) for s in segs], np.int64)
    got = _ts_seq_checksums(flat, lens)
    want = [_ts_sym_checksum(s) for s in segs]
    assert got == want
    assert _ts_seq_checksums([], np.array([0, 0], np.int64)) == [0, 0]


# --- baseline JPEG codec (stages/jpegcodec.py) ------------------------------


def test_jpeg_flat_blocks_bit_exact():
    """Flat blocks are DC-only streams; at quality 100 the DC quantizer
    is 1 so the roundtrip is bit-exact (the codec's hand-checkable
    anchor case, like the PNG hand-computed pixels)."""
    from pholcus_ray.stages.jpegcodec import jpeg_decode, jpeg_encode

    for v in (0, 1, 7, 127, 128, 200, 255):
        img = np.full((16, 24), v, np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=100))
        assert out.shape == (16, 24) and (out == v).all(), v
    # flat RGB through the YCbCr transform, both subsampling layouts
    for ss in ("444", "420"):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = (90, 160, 30)
        out = jpeg_decode(jpeg_encode(img, quality=100, subsample=ss))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1, ss


def test_jpeg_roundtrip_bounded_error_and_restarts():
    """Smooth content roundtrips within a small bound at high quality;
    restart intervals (DRI/RSTn) change the stream layout but not the
    decode; byte stuffing is exercised by construction."""
    from pholcus_ray.stages.jpegcodec import jpeg_decode, jpeg_encode

    g = np.zeros((48, 64, 3), np.uint8)
    g[..., 0] = np.linspace(0, 250, 64).astype(np.uint8)[None, :]
    g[..., 1] = np.linspace(0, 250, 48).astype(np.uint8)[:, None]
    g[..., 2] = 77
    base = None
    for ri in (0, 1, 3):
        out = jpeg_decode(jpeg_encode(g, 90, "444", restart_interval=ri))
        err = np.abs(out.astype(int) - g.astype(int))
        assert err.max() <= 8 and err.mean() < 2
        if base is None:
            base = out
        else:  # restart layout must not change decoded pixels
            assert (out == base).all()
    out = jpeg_decode(jpeg_encode(g, 90, "420"))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 12


def test_jpeg_decoder_reads_third_party_file_and_guards():
    """The decoder reads a JPEG this repo did not produce (CPython's
    test_email fixture) and refuses non-baseline streams honestly."""
    import os

    import pytest as _pytest

    import test.test_email as _tte
    from pholcus_ray.stages.jpegcodec import jpeg_decode

    p = os.path.join(os.path.dirname(_tte.__file__), "data", "python.jpg")
    px = jpeg_decode(open(p, "rb").read())
    assert px.shape == (16, 16, 3) and px.dtype == np.uint8
    with _pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG not a jpeg")
    # progressive SOF2 refused with the stated scope error
    import struct

    fake = (b"\xFF\xD8\xFF\xC2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    with _pytest.raises(NotImplementedError):
        jpeg_decode(fake)


def test_jpeg_stage_and_sniff(ray_session):
    """DecodeJpeg actor pool decodes the synth table to its generator
    geometry; sniff_mime routes JPEG payloads by the SOI magic."""
    from pholcus_ray.stages.multimodal import (DecodeJpeg, sniff_mime,
                                               synth_jpeg_table)

    t = synth_jpeg_table(12)
    assert all(sniff_mime(p) == "image/jpeg"
               for p in t["payload"].to_pylist())
    import ray.data as rd

    out = (rd.from_arrow(t).repartition(3)
           .map_batches(DecodeJpeg, batch_format="pyarrow", batch_size=4,
                        concurrency=2)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    src = t.to_pandas()
    assert (out["decoded_width"].values == src["width"].values).all()
    assert (out["decoded_height"].values == src["height"].values).all()
    assert (out["decoded_channels"].values == src["channels"].values).all()
    assert (out["decoded_format"] == "jpeg").all()


# --- FLAC codec (stages/flaccodec.py) ---------------------------------------


def test_flac_lossless_roundtrip_all_shapes():
    """FLAC is lossless: every roundtrip is BIT-EXACT — mono/stereo,
    partial final blocks, constant and noise extremes; CRC-8/CRC-16 and
    the STREAMINFO MD5 are verified on the way back."""
    from pholcus_ray.stages.flaccodec import flac_decode, flac_encode

    rng = np.random.default_rng(5)
    t = np.arange(7001)
    tone = (2500 * np.sin(t / 9)
            + rng.normal(0, 120, len(t))).astype(np.int16)
    for sig, sr, bsz in (
        (tone, 8000, 4096),
        (tone, 22050, 777),                       # partial last block
        (np.stack([tone, (tone // 3).astype(np.int16)], axis=1),
         44100, 1000),
        (np.full(300, -7, np.int16), 16000, 4096),   # constant
        (rng.integers(-32768, 32767, 53, dtype=np.int16), 8000, 16),
    ):
        back, got_sr = flac_decode(flac_encode(sig, sr, block_size=bsz))
        src = sig[:, None] if sig.ndim == 1 else sig
        assert got_sr == sr
        assert back.shape == src.shape and (back == src).all()


def test_flac_crc_and_md5_tamper_detected():
    """Flipping one payload byte fails a CRC (or the stream MD5) loudly."""
    import pytest as _pytest

    from pholcus_ray.stages.flaccodec import flac_decode, flac_encode

    sig = (1000 * np.sin(np.arange(2000) / 7)).astype(np.int16)
    enc = bytearray(flac_encode(sig, 8000))
    enc[len(enc) // 2] ^= 0x40
    with _pytest.raises(ValueError):
        flac_decode(bytes(enc))
    assert (flac_decode(bytes(flac_encode(sig, 8000)))[0][:, 0]
            == sig).all()


def _flac_frame_header(bs, nch, w):
    import struct

    from pholcus_ray.stages.flaccodec import (_SYNC, _crc8,
                                              _utf8_number)

    w.write(_SYNC, 14)
    w.write(0, 2)
    w.write(0b0111, 4)   # 16-bit block size at end
    w.write(0, 4)        # rate from STREAMINFO
    w.write(nch - 1, 4)
    w.write(0b100, 3)    # 16 bps
    w.write(0, 1)
    w.align()
    head = w.bytes() + _utf8_number(0) + struct.pack(">H", bs - 1)
    return head + bytes([_crc8(head)])


def test_flac_decoder_paths_lpc_escape_wasted_midside():
    """Hand-built streams exercise the decoder paths our encoder never
    emits: an LPC subframe, an escape-coded Rice partition, wasted
    bits, and mid/side stereo — each decoded to hand-computed samples."""
    import struct

    from pholcus_ray.stages.flaccodec import (_BitWriter, _crc16,
                                              flac_decode, flac_encode)

    def stream_for(frame_body_bits, bs, nch, n_total):
        # STREAMINFO via the real encoder, then replace the frame
        base = flac_encode(np.zeros(max(n_total, 1), np.int16), 8000)
        streaminfo_end = 4 + 4 + 34
        w = _BitWriter()
        head = _flac_frame_header(bs, nch, w)
        frame = head + frame_body_bits
        frame += struct.pack(">H", _crc16(frame))
        return base[:streaminfo_end] + frame

    # --- LPC order 1, coef 2, shift 1: x[i] = res[i-1] + (2*x[i-1])>>1
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b100000, 6)       # LPC, order 1
    w.write(0, 1)              # no wasted bits
    w.write(5, 16)             # warmup x[0] = 5
    w.write(3, 4)              # precision-1 = 3 -> 4-bit coefs
    w.write(1, 5)              # shift = 1
    w.write(2, 4)              # coef = 2
    w.write(0, 2)              # rice method 0
    w.write(0, 4)              # partition order 0
    w.write(0, 4)              # rice param 0
    for v in (1, -1, 0):       # residuals, zigzag: 2, 1, 0
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        w.unary(u)
    w.align()
    sig, _ = flac_decode(stream_for(w.bytes(), 4, 1, 4), verify=False)
    # x[i] = res + x[i-1]: [5, 1+5, -1+6, 0+5]
    assert sig[:, 0].tolist() == [5, 6, 5, 5]

    # --- escape partition: raw 6-bit residuals
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b001000, 6)       # FIXED order 0
    w.write(0, 1)
    w.write(0, 2)              # method 0
    w.write(0, 4)              # one partition
    w.write(0xF, 4)            # escape
    w.write(6, 5)              # 6 raw bits per residual
    for v in (31, -32, 7):
        w.write(v & 0x3F, 6)
    w.align()
    sig, _ = flac_decode(stream_for(w.bytes(), 3, 1, 3), verify=False)
    assert sig[:, 0].tolist() == [31, -32, 7]

    # --- wasted bits: stored >>1, reconstructed <<1
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b001000, 6)       # FIXED order 0
    w.write(1, 1)              # wasted-bits flag
    w.unary(0)                 # unary 0 -> 1 wasted bit
    w.write(0, 2)
    w.write(0, 4)
    w.write(0, 4)
    for v in (3, -2):          # stored halves -> samples 6, -4
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        w.unary(u)
    w.align()
    sig, _ = flac_decode(stream_for(w.bytes(), 2, 1, 2), verify=False)
    assert sig[:, 0].tolist() == [6, -4]

    # --- mid/side: l=[10, 4], r=[6, 8] -> mid=[8, 6], side=[4, -4]
    w = _BitWriter()
    from pholcus_ray.stages.flaccodec import _SYNC, _crc8, _utf8_number
    w.write(_SYNC, 14)
    w.write(0, 2)
    w.write(0b0111, 4)
    w.write(0, 4)
    w.write(0b1010, 4)         # mid/side
    w.write(0b100, 3)
    w.write(0, 1)
    w.align()
    head = w.bytes() + _utf8_number(0) + struct.pack(">H", 1)
    head += bytes([_crc8(head)])
    w = _BitWriter()
    for vals, bits in (((8, 6), 16), ((4, -4), 17)):  # mid, then side
        w.write(0, 1)
        w.write(0b000001, 6)   # VERBATIM
        w.write(0, 1)
        for v in vals:
            w.write(v & ((1 << bits) - 1), bits)
    w.align()
    body = w.bytes()
    base = flac_encode(np.zeros((2, 2), np.int16), 8000)
    frame = head + body
    frame += struct.pack(">H", _crc16(frame))
    sig, _ = flac_decode(base[:42] + frame, verify=False)
    assert sig.tolist() == [[10, 6], [4, 8]]


def test_flac_stage_and_sniff(ray_session):
    """DecodeFlac actor pool decodes the synth table to its generator
    geometry; sniff_mime routes FLAC payloads by the fLaC magic."""
    from pholcus_ray.stages.multimodal import (DecodeFlac, sniff_mime,
                                               synth_flac_table)

    t = synth_flac_table(10)
    assert all(sniff_mime(p) == "audio/flac"
               for p in t["payload"].to_pylist())
    import ray.data as rd

    out = (rd.from_arrow(t).repartition(3)
           .map_batches(DecodeFlac, batch_format="pyarrow", batch_size=4,
                        concurrency=2)
           .to_pandas().sort_values("audio_id").reset_index(drop=True))
    src = t.to_pandas()
    assert (out["decoded_rate"].values == src["sample_rate"].values).all()
    assert (out["decoded_samples"].values == src["n_samples"].values).all()
    assert (out["decoded_channels"].values == src["channels"].values).all()
