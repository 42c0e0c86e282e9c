"""Training-batch operators (sequence packing, line-level dedup,
semantic dedup) vs DuckDB oracles + engineered-corpus semantics."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import SF, assert_frames_match, to_pandas
from crawlingathome_server_ray.pipelines import training_queries as tq
from test_analytics import _con


@pytest.mark.parametrize("name", sorted(tq.TRAINING_SQL))
def test_training_query_matches_oracle(ray_session, name):
    con = _con(SF)
    oracle = con.execute(tq.TRAINING_SQL[name]).df()
    result = tq.TRAINING_QUERIES[name](SF)
    assert_frames_match(result, oracle, name)


# ------------------------------------------------------------- seq_pack
def _scalar_pack(texts_by_doc, block_len):
    """Pure-python packing twin: global token stream in doc_id order."""
    blocks = {}
    pos = 0
    for doc_id in sorted(texts_by_doc):
        for tok in texts_by_doc[doc_id].split():
            bid = pos // block_len
            le = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                                "big")
            h = int(np.uint64(le).byteswap()) % tq.HASH_MOD
            e = blocks.setdefault(bid, {"n": 0, "docs": set(), "hs": 0})
            e["n"] += 1
            e["docs"].add(doc_id)
            e["hs"] = (e["hs"] + h) % tq.HASH_MOD
            pos += 1
    return blocks


def test_seq_pack_matches_scalar_twin(ray_session):
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    expect = _scalar_pack(dict(zip(docs.doc_id, docs.text)), tq.SEQPACK_LEN)
    got = to_pandas(tq.q_seq_pack(SF)).set_index("block_id").sort_index()
    assert sorted(got.index) == sorted(expect)
    for bid, e in expect.items():
        row = got.loc[bid]
        assert row.n_tokens == e["n"]
        assert row.n_docs == len(e["docs"])
        assert row.first_doc == min(e["docs"])
        assert row.last_doc == max(e["docs"])
        assert row.tok_hash_mod == e["hs"]


def test_seq_pack_blocks_are_full_and_contiguous(ray_session):
    got = to_pandas(tq.q_seq_pack(SF)).sort_values("block_id")
    ids = got.block_id.to_numpy()
    assert (ids == np.arange(len(ids))).all(), "blocks must be contiguous"
    assert (got.n_tokens.iloc[:-1] == tq.SEQPACK_LEN).all(), \
        "every block but the last is exactly block_len tokens"
    assert 0 < got.n_tokens.iloc[-1] <= tq.SEQPACK_LEN
    # packing is real: docs shorter than block_len share blocks
    assert (got.n_docs >= 2).any()


# ------------------------------------------------------- doc_line_dedup
def _write_docs(tmpdir, texts):
    path = tmpdir / "documents.parquet"
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts), pa.string()),
                  "source": pa.array(["t"] * len(texts), pa.string()),
                  "n_chars": pa.array([len(s) for s in texts], pa.int64())})
    pq.write_table(t, str(path))
    return str(tmpdir)


def test_line_dedup_engineered_multiline(ray_session, tmp_path):
    """Multi-line corpus with cross-doc duplicate lines: first occurrence
    (smallest doc_id, then line index) survives; later copies are
    dropped; unique lines untouched; empty docs are one empty line."""
    texts = ["alpha\nbeta\ngamma",
             "beta\ndelta",            # beta dup of doc0:1
             "gamma\nalpha\nepsilon",  # both dups of doc0
             "",                       # one empty line (first '' wins)
             "\nzeta",                 # '' dup of doc3, zeta unique
             "alpha\nbeta\ngamma"]     # fully duplicate doc
    d = _write_docs(tmp_path, texts)
    out = to_pandas(tq.q_doc_line_dedup(d)).set_index("doc_id").sort_index()

    seen, expect = set(), {}
    for i, s in enumerate(texts):
        lines = s.split("\n")
        kept = [ln for ln in lines if ln not in seen and not seen.add(ln)]
        expect[i] = (len(lines), len(kept), "\n".join(kept))
    for i, (n_lines, n_kept, text_kept) in expect.items():
        row = out.loc[i]
        assert row.n_lines == n_lines, i
        assert row.n_kept == n_kept, i
        assert row.text_kept == text_kept, i
    # and the engineered corpus matches the SQL oracle end to end
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    assert_frames_match(to_pandas(tq.q_doc_line_dedup(d)),
                        con.execute(tq.SQL_LINE_DEDUP).df(),
                        "line_dedup_engineered")


# ------------------------------------------------------- semantic_dedup
def _write_embeddings(tmpdir, mat):
    path = tmpdir / "embeddings.parquet"
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(np.asarray(mat, np.float64).reshape(-1), pa.float64()),
        mat.shape[1])
    t = pa.table({"vec_id": pa.array(range(len(mat)), pa.int64()),
                  "embedding": emb,
                  "label": pa.array([0] * len(mat), pa.int64())})
    pq.write_table(t, str(path))
    return str(tmpdir)


def test_semantic_dedup_drops_planted_duplicates(ray_session, tmp_path):
    """60 well-separated random vectors, of which ids 3/17/41 are exact
    copies of ids 0/1/2 — only the minimum id of each duplicate group is
    kept; all genuinely distinct vectors survive."""
    rng = np.random.default_rng(7)
    m = rng.normal(size=(60, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    dup_of = {3: 0, 17: 1, 41: 2}
    for b, a in dup_of.items():
        m[b] = m[a]
    d = _write_embeddings(tmp_path, m)
    out = (to_pandas(tq.q_semantic_dedup(d, threshold=0.999, n_clusters=4))
           .set_index("vec_id").sort_index())
    assert len(out) == 60
    dropped = set(out.index[~out.is_kept])
    assert dropped == set(dup_of), dropped


def test_seq_pack_random_multiline_corpus(ray_session, tmp_path):
    """Seeded random corpus with newlines, tabs, edge whitespace, empty
    docs: Ray packing ≡ the scalar twin (token order, block cuts,
    checksums) — whitespace of every kind is a separator on both sides."""
    rng = np.random.default_rng(11)
    words = [f"t{i}" for i in range(50)]
    seps = np.array([" ", "\n", "\t", "  ", " \n"], dtype=object)
    texts = []
    for _ in range(200):
        n = int(rng.integers(0, 30))
        toks = rng.choice(words, size=n)
        ss = rng.choice(seps, size=max(n, 1))
        t = "".join(w + s for w, s in zip(toks, ss))
        texts.append(t if rng.integers(2) else t.strip())
    d = _write_docs(tmp_path, texts)
    expect = _scalar_pack(dict(enumerate(texts)), tq.SEQPACK_LEN)
    got = to_pandas(tq.q_seq_pack(d)).set_index("block_id").sort_index()
    assert sorted(got.index) == sorted(expect)
    for bid, e in expect.items():
        row = got.loc[bid]
        assert (row.n_tokens, row.n_docs, row.first_doc, row.last_doc,
                row.tok_hash_mod) == (e["n"], len(e["docs"]),
                                      min(e["docs"]), max(e["docs"]),
                                      e["hs"])


def test_line_dedup_random_corpus(ray_session, tmp_path):
    """Seeded random multi-line corpus with a small line alphabet (heavy
    cross-doc duplication): Ray ≡ scalar first-wins on every doc."""
    rng = np.random.default_rng(23)
    alphabet = [f"line {i}" for i in range(30)] + [""]
    texts = ["\n".join(rng.choice(alphabet,
                                  size=int(rng.integers(1, 8))))
             for _ in range(300)]
    d = _write_docs(tmp_path, texts)
    out = to_pandas(tq.q_doc_line_dedup(d)).set_index("doc_id").sort_index()
    seen = set()
    for i, s in enumerate(texts):
        lines = s.split("\n")
        kept = [ln for ln in lines if ln not in seen and not seen.add(ln)]
        row = out.loc[i]
        assert row.n_lines == len(lines), i
        assert row.n_kept == len(kept), i
        assert row.text_kept == "\n".join(kept), i


def test_semantic_dedup_distributed_branch_equals_driver(ray_session,
                                                         tmp_path):
    """Forcing the distributed clustering branch (threshold 0) end-to-end
    — pairs stay a Dataset through the count switch, clustering is
    min-label propagation — must flag exactly the same vectors as the
    driver union-find branch."""
    rng = np.random.default_rng(13)
    m = rng.normal(size=(40, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for b, a in {5: 0, 21: 0, 33: 2}.items():  # one 3-cluster + one pair
        m[b] = m[a]
    d = _write_embeddings(tmp_path, m)
    drv = (to_pandas(tq.q_semantic_dedup(d, threshold=0.999, n_clusters=4))
           .sort_values("vec_id").reset_index(drop=True))
    dist = (to_pandas(tq.q_semantic_dedup(d, threshold=0.999, n_clusters=4,
                                          distributed_pairs_threshold=0))
            .sort_values("vec_id").reset_index(drop=True))
    assert drv.equals(dist)
    assert set(drv.loc[~drv.is_kept, "vec_id"]) == {5, 21, 33}


def test_semantic_dedup_keeps_distinct_corpus(ray_session):
    """The synthetic sf embeddings carry no ≥0.95-cosine duplicates, so
    semantic dedup is the identity there (and covers the no-pairs path)."""
    out = to_pandas(tq.q_semantic_dedup(SF))
    assert out.is_kept.all()
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert len(out) == n


def test_shard_shuffle_is_a_permutation_and_order_is_seeded(ray_session):
    """The shard shuffle emits every doc exactly once, positions are a
    contiguous 0..n_s-1 range per shard, the within-shard order follows
    the seeded md5 key (recomputed scalar-side), and shard sizes are
    multinomial-balanced (no shard hogs the corpus)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    from crawlingathome_server_ray.functions.canonicalize import \
        md5_hash64_slow

    sf = "/root/testdata/sf0.001"
    out = tq.q_training_shard_shuffle(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    assert sorted(out.doc_id) == sorted(docs.doc_id)        # permutation
    for sh, g in out.groupby("shard"):
        g = g.sort_values("pos")
        assert (g.pos.to_numpy() == np.arange(len(g))).all()
        keys = (md5_hash64_slow(
            [f"{tq.SHUF_SALT}{d}" for d in g.doc_id]) >> np.uint64(4))
        assert (keys % tq.SHUF_SHARDS == sh).all()
        order = np.lexsort((g.doc_id.to_numpy(), keys.astype(np.int64)))
        assert (order == np.arange(len(g))).all()           # seeded order
    sizes = out.groupby("shard").size()
    n, p = len(docs), 1.0 / tq.SHUF_SHARDS
    sd = (n * p * (1 - p)) ** 0.5
    assert (abs(sizes - n * p) <= 5 * sd + 1).all()
