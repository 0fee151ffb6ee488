"""Temperature-based source mixing: rebalancing property + determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.text_analysis import (
    temperature_sample,
)


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """Heavily skewed sources: big (3000 docs), small (60 docs)."""
    d = tmp_path_factory.mktemp("tempmix")
    n_big, n_small = 3000, 60
    rows = pd.DataFrame({
        "doc_id": pd.array(range(n_big + n_small), dtype="int64"),
        "source": ["big"] * n_big + ["small"] * n_small,
        "text": ["x"] * (n_big + n_small),
    })
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                   d / "documents.parquet")
    return str(d)


def test_small_sources_upweighted(ray_session, skew_dir):
    out = temperature_sample(skew_dir, alpha=0.5, target_frac=0.3) \
        .to_pandas()
    picked = out.groupby("source").size()
    # sampling rates: small sources keep a much larger fraction
    rate_big = picked.get("big", 0) / 3000
    rate_small = picked.get("small", 0) / 60
    assert rate_small > 3 * rate_big
    # expected totals hold approximately (md5 is uniform)
    assert abs(len(out) - 0.3 * 3060) / (0.3 * 3060) < 0.15


def test_deterministic_and_block_invariant(ray_session, skew_dir):
    a = temperature_sample(skew_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = temperature_sample(skew_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_alpha_one_is_uniform_rate(ray_session, skew_dir):
    """alpha=1 gives every source the same sampling probability."""
    out = temperature_sample(skew_dir, alpha=1.0, target_frac=0.4) \
        .to_pandas()
    picked = out.groupby("source").size()
    rate_big = picked.get("big", 0) / 3000
    rate_small = picked.get("small", 0) / 60
    assert abs(rate_big - 0.4) < 0.08
    assert abs(rate_small - 0.4) < 0.2  # small n → wider tolerance
