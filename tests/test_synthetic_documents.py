"""Fresh-entropy fixture generator contract (VERDICT r4 #1): the sf1
slope fixtures must be a pure function of (seed, id) with a CONTROLLED
duplicate rate, so scaling slopes measure data growth, not duplicate
density."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawling_vectordb_llm_spark.sources.synthetic_documents import (
    DOC_EXACT_CUT,
    DOC_ORIGINAL_CUT,
    EMB_DUP_CUT,
    fresh_documents,
    fresh_embeddings,
)


def test_fresh_documents_dup_structure_and_determinism(spark):
    d = (
        fresh_documents(spark, 2000)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(d) == 2000
    assert list(d.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    orig = d[d.doc_id % 100 < DOC_ORIGINAL_CUT]
    exact = d[(d.doc_id % 100 >= DOC_ORIGINAL_CUT) & (d.doc_id % 100 < DOC_EXACT_CUT)]
    near = d[d.doc_id % 100 >= DOC_EXACT_CUT]
    # seeded-unique originals: 30^10 min possibilities -> no collisions
    assert orig.text.nunique() == len(orig)
    # every exact dup reproduces some original verbatim
    assert exact.text.isin(set(orig.text)).all()
    # every near dup carries the marker token and differs from all
    # originals (one position replaced)
    assert near.text.str.contains("dup").all()
    assert not near.text.isin(set(orig.text)).any()
    # controlled rate: 93 / 4 / 3 per 100 ids
    assert len(exact) == 2000 * 4 // 100 and len(near) == 2000 * 3 // 100
    # n_chars is derived, lang/source in-domain
    assert (d.n_chars == d.text.str.len()).all()
    assert set(d.lang) <= {"en", "de", "zh", "fr", "es"}
    assert d.source.str.fullmatch(r"src\d{1,2}").all()
    # partitioning-independent (pure in (seed, id))
    d2 = (
        fresh_documents(spark, 2000, partitions=5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(d, d2)
    # a larger corpus is a SUPERSET law: ids keep their class, originals
    # keep their text (masters are drawn from n_originals, which grows,
    # so dup rows may remap — but originals never change)
    d3 = fresh_documents(spark, 4000).toPandas().set_index("doc_id")
    o3 = d3[d3.index % 100 < DOC_ORIGINAL_CUT]
    merged = orig.set_index("doc_id").join(o3, rsuffix="_big", how="inner")
    assert (merged.text == merged.text_big).all()


def test_fresh_embeddings_geometry(spark):
    e = (
        fresh_embeddings(spark, 1000)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(e.columns) == ["vec_id", "embedding", "label"]
    M = np.array([np.asarray(v) for v in e.embedding])
    assert M.shape == (1000, 64) and M.dtype == np.float32
    assert np.allclose(np.linalg.norm(M, axis=1), 1.0, atol=1e-5)
    assert e.label.between(0, 9).all()
    base = e.vec_id % 100 < EMB_DUP_CUT
    B, D = M[base.to_numpy()], M[(~base).to_numpy()]
    # every dup sits within cos ~0.99 of some base vector; base corpus
    # itself is isotropic (driver-fixture geometry)
    assert (D @ B.T).max(axis=1).min() > 0.99
    off_diag = B[:100] @ B[100:200].T
    assert np.abs(off_diag).mean() < 0.2
    # labels of dups match their master's label (nearest base vector)
    nearest = (D @ B.T).argmax(axis=1)
    dup_labels = e.label[(~base).to_numpy()].to_numpy()
    assert (dup_labels == e.label[base.to_numpy()].to_numpy()[nearest]).all()
    # determinism across partitioning
    e2 = (
        fresh_embeddings(spark, 1000, partitions=3)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert e.vec_id.equals(e2.vec_id) and e.label.equals(e2.label)
    M2 = np.array([np.asarray(v) for v in e2.embedding])
    assert np.array_equal(M, M2)
