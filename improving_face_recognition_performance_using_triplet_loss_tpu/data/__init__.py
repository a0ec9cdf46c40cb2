"""Data pipeline: positive-pair batching, feature store, packed records,
synthetic data, LFW pairs."""

from .pairs import build_positive_index, PairBatcher  # noqa: F401
from .streaming import ShardedPairBatcher, shard_bounds  # noqa: F401
from .feature_store import (  # noqa: F401
    write_feature_csv,
    read_feature_csv,
    write_labels_csv,
    read_labels_csv,
    save_feature_store,
    load_feature_store,
    split_identities,
)
from .synthetic import synthetic_features, synthetic_faces  # noqa: F401
