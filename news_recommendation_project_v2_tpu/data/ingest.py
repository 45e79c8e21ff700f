"""MIND raw TSV ingest -> processed parquet/npz store, and the processed loader.

Capability parity with the reference ingest path (``/root/reference/src/
news_rec_utils/data_utils.py:125-165`` ``read_data``, ``:430-439`` ``process_news``,
``:442-455`` ``store_processed_data``, ``:26-122`` ``load_dataset``), with two
deliberate changes (quirks ledger, SURVEY.md §7.4):

- category AND subcategory vocabularies are generated from ``news.tsv`` during
  ingest (the reference requires a ``sub_categories.json`` that is absent from its
  repo, ``data_utils.py:45-46``);
- entity embeddings are stored as one dense float32 matrix + id index (npz) instead
  of a pickled dict of Python lists (``data_utils.py:164``).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from ..config import ENTITY_EMBEDDING_DIM, DataSubset, NewsDataset

BEHAVIOR_COLUMNS = ["ImpressionID", "UserID", "Time", "History", "Impressions"]
NEWS_COLUMNS = [
    "NewsID",
    "Category",
    "SubCategory",
    "Title",
    "Abstract",
    "URL",
    "Title Entities",
    "Abstract Entities",
]


def read_raw(data_dir: Path, dataset: NewsDataset):
    """Read behaviors.tsv / news.tsv / entity_embedding.vec (reference
    ``data_utils.py:125-165``)."""
    raw = Path(data_dir) / "raw" / dataset.value
    behaviors = pd.read_csv(
        raw / "behaviors.tsv", sep="\t", header=None, names=BEHAVIOR_COLUMNS
    )
    news = pd.read_csv(raw / "news.tsv", sep="\t", header=None, names=NEWS_COLUMNS)
    ent = pd.read_csv(raw / "entity_embedding.vec", sep="\t", header=None)
    # Columns: entity id, 100 floats, trailing empty column from the tab separator.
    entity_ids = ent[0].to_numpy(dtype=np.str_)
    entity_vecs = (
        ent.drop(columns=[0, ent.shape[1] - 1], errors="ignore")
        .to_numpy(dtype=np.float32)
    )
    assert entity_vecs.shape[1] == ENTITY_EMBEDDING_DIM, entity_vecs.shape
    return behaviors, news, entity_ids, entity_vecs


def build_news_text(news: pd.DataFrame) -> pd.DataFrame:
    """Title-only text template (reference ``data_utils.py:430-439``; richer
    templates were commented out there)."""
    news = news.copy()
    news["news_text"] = "Title: " + news["Title"].fillna("")
    return news


def store_processed_data(data_dir: Path, dataset: NewsDataset) -> Path:
    """Write behaviors.parquet, news_text.parquet, entity_embeds.npz and the
    category vocabularies (reference ``data_utils.py:442-455``)."""
    data_dir = Path(data_dir)
    behaviors, news, entity_ids, entity_vecs = read_raw(data_dir, dataset)
    news = build_news_text(news)

    out = data_dir / "processed" / dataset.value
    out.mkdir(parents=True, exist_ok=True)
    behaviors.to_parquet(out / "behaviors.parquet")
    news.to_parquet(out / "news_text.parquet")
    np.savez(
        out / "entity_embeds.npz", entity_ids=entity_ids, entity_vecs=entity_vecs
    )

    for column, fname in (("Category", "categories.json"), ("SubCategory", "sub_categories.json")):
        vocab_path = data_dir / fname
        existing = json.loads(vocab_path.read_text()) if vocab_path.exists() else {}
        nxt = max(existing.values(), default=-1) + 1
        for name in news[column].dropna().unique():
            if name not in existing:
                existing[name] = nxt
                nxt += 1
        vocab_path.write_text(json.dumps(existing, indent=1))
    return out


@dataclasses.dataclass
class LoadedDataset:
    """Behaviors + per-news feature tables (reference ``load_dataset`` return,
    ``data_utils.py:114-122``, with dicts replaced by aligned arrays)."""

    behaviors: pd.DataFrame
    news_ids: np.ndarray  # [n_news] str (aligned index for the arrays below)
    news_text: dict[str, str]
    news_title: dict[str, str]
    news_abstract: dict[str, str]
    news_category: dict[str, int]
    news_subcategory: dict[str, int]
    news_title_entity: dict[str, np.ndarray]  # mean 100-dim entity vector
    news_abstract_entity: dict[str, np.ndarray]


def _mean_entity_vectors(
    entities_json: pd.Series, id_to_row: dict[str, int], vecs: np.ndarray
) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    zero = np.zeros(ENTITY_EMBEDDING_DIM, dtype=np.float32)
    for news_id, payload in entities_json.items():
        if pd.isnull(payload):
            out[news_id] = zero
            continue
        rows = [
            id_to_row[e["WikidataId"]]
            for e in json.loads(payload)
            if e.get("WikidataId") in id_to_row
        ]
        out[news_id] = vecs[rows].mean(axis=0) if rows else zero
    return out


def load_dataset(
    data_dir: Path,
    dataset: NewsDataset,
    num_samples: Optional[int] = None,
    data_subset: DataSubset = DataSubset.ALL,
    seed: int = 1234,
) -> LoadedDataset:
    """Load processed tables, build per-news feature dicts, filter/sample rows
    (reference ``data_utils.py:26-122``)."""
    data_dir = Path(data_dir)
    proc = data_dir / "processed" / dataset.value
    behaviors = pd.read_parquet(
        proc / "behaviors.parquet",
        columns=["ImpressionID", "History", "Impressions"],
    )
    news = pd.read_parquet(proc / "news_text.parquet").set_index("NewsID")
    ent = np.load(proc / "entity_embeds.npz", allow_pickle=False)
    id_to_row = {str(e): i for i, e in enumerate(ent["entity_ids"])}
    cat_vocab = json.loads((data_dir / "categories.json").read_text())
    subcat_vocab = json.loads((data_dir / "sub_categories.json").read_text())

    if data_subset == DataSubset.WITH_HISTORY:
        behaviors = behaviors[behaviors["History"].notna()].reset_index(drop=True)
    elif data_subset == DataSubset.WITHOUT_HISTORY:
        behaviors = behaviors[behaviors["History"].isna()].reset_index(drop=True)
    if num_samples and num_samples < len(behaviors):
        behaviors = behaviors.sample(
            n=num_samples, random_state=seed, replace=False
        ).reset_index(drop=True)

    return LoadedDataset(
        behaviors=behaviors,
        news_ids=news.index.to_numpy(dtype=np.str_),
        news_text=news["news_text"].to_dict(),
        news_title={
            k: "News Title: " + v for k, v in news["Title"].dropna().to_dict().items()
        },
        news_abstract={
            k: "News Abstract: " + v
            for k, v in news["Abstract"].dropna().to_dict().items()
        },
        news_category=news["Category"].map(cat_vocab).to_dict(),
        news_subcategory=news["SubCategory"].map(subcat_vocab).to_dict(),
        news_title_entity=_mean_entity_vectors(
            news["Title Entities"], id_to_row, ent["entity_vecs"]
        ),
        news_abstract_entity=_mean_entity_vectors(
            news["Abstract Entities"], id_to_row, ent["entity_vecs"]
        ),
    )
