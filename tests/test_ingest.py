"""Ingest round trip over the synthetic MIND fixture (reference
``data_utils.py:125-165,442-455,26-122``)."""

import numpy as np

from news_recommendation_project_v2_tpu.config import DataSubset, NewsDataset
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.ingest import (
    load_dataset,
    store_processed_data,
)
from news_recommendation_project_v2_tpu.data.synthetic import write_synthetic_mind


def test_ingest_roundtrip(tmp_path):
    write_synthetic_mind(tmp_path, NewsDataset.MINDsmall_train)
    out = store_processed_data(tmp_path, NewsDataset.MINDsmall_train)
    assert (out / "behaviors.parquet").exists()
    assert (out / "news_text.parquet").exists()
    assert (out / "entity_embeds.npz").exists()
    assert (tmp_path / "categories.json").exists()
    assert (tmp_path / "sub_categories.json").exists()

    ds = load_dataset(tmp_path, NewsDataset.MINDsmall_train)
    assert len(ds.behaviors) == 40
    assert len(ds.news_ids) == 60
    # Title-only template (reference data_utils.py:436).
    assert ds.news_text["N0"].startswith("Title: ")
    # Vocabularies map every news row.
    assert all(isinstance(v, int) for v in ds.news_category.values())
    assert all(isinstance(v, int) for v in ds.news_subcategory.values())
    # Entity vectors are 100-dim means.
    assert ds.news_title_entity["N1"].shape == (100,)

    # The compiled behaviors plug straight in.
    c = compile_behaviors(
        ds.behaviors["Impressions"].tolist(), ds.behaviors["History"].tolist()
    )
    assert c.num_rows == 40
    assert c.label_present
    # Every referenced news id exists in the news table.
    assert set(c.news_ids.tolist()) <= set(ds.news_ids.tolist())


def test_subset_filters(tmp_path):
    write_synthetic_mind(tmp_path, NewsDataset.MINDsmall_train)
    store_processed_data(tmp_path, NewsDataset.MINDsmall_train)
    all_rows = load_dataset(tmp_path, NewsDataset.MINDsmall_train).behaviors
    with_h = load_dataset(
        tmp_path, NewsDataset.MINDsmall_train, data_subset=DataSubset.WITH_HISTORY
    ).behaviors
    without_h = load_dataset(
        tmp_path, NewsDataset.MINDsmall_train, data_subset=DataSubset.WITHOUT_HISTORY
    ).behaviors
    assert len(with_h) + len(without_h) == len(all_rows)
    assert with_h["History"].notna().all()
    assert without_h["History"].isna().all()
    sampled = load_dataset(
        tmp_path, NewsDataset.MINDsmall_train, num_samples=7
    ).behaviors
    assert len(sampled) == 7
