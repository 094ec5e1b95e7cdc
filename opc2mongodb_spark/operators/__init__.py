from opc2mongodb_spark.operators.asof import asof_join
from opc2mongodb_spark.operators.components import connected_components
from opc2mongodb_spark.operators.compaction import compact_parquet
from opc2mongodb_spark.operators.compress import reconstruct_error, swinging_door
from opc2mongodb_spark.operators.dedup import (
    exact_dedup_groups,
    incremental_keep_list,
    jaccard_on_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_neardup_pairs,
    winnow_sketch,
)
from opc2mongodb_spark.operators.histogram import (
    cell_stats,
    rank_select,
    with_cells,
)
from opc2mongodb_spark.operators.incremental import (
    finish_view,
    merge_agg_state,
    partial_agg_state,
)
from opc2mongodb_spark.operators.kmeans import assign_cells, centroid_update, lloyd
from opc2mongodb_spark.operators.last_value import last_value_per_key
from opc2mongodb_spark.operators.similarity import cosine_topk, mmr_rerank
from opc2mongodb_spark.operators.layout import (
    layout_skipping_stats,
    zorder_code,
    zorder_layout,
)
from opc2mongodb_spark.operators.pagerank import pagerank
from opc2mongodb_spark.operators.skew import (
    key_skew_gini,
    salted_aggregate,
    salted_join,
)
from opc2mongodb_spark.operators.sharding import (
    shard_assignment,
    write_training_shards,
)

__all__ = [
    "asof_join",
    "assign_cells",
    "centroid_update",
    "compact_parquet",
    "connected_components",
    "exact_dedup_groups",
    "cell_stats",
    "finish_view",
    "incremental_keep_list",
    "jaccard_on_pairs",
    "key_skew_gini",
    "last_value_per_key",
    "layout_skipping_stats",
    "lloyd",
    "cosine_topk",
    "mmr_rerank",
    "lsh_candidate_pairs",
    "merge_agg_state",
    "minhash_signatures",
    "pagerank",
    "rank_select",
    "partial_agg_state",
    "reconstruct_error",
    "shard_assignment",
    "swinging_door",
    "simhash_neardup_pairs",
    "winnow_sketch",
    "with_cells",
    "write_training_shards",
    "zorder_code",
    "zorder_layout",
]
