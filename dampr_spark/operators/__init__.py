from dampr_spark.operators import (
    dedup,
    graph,
    multimodal,
    selection,
    similarity,
    sketches,
    stats,
    temporal,
)

__all__ = [
    "dedup",
    "graph",
    "multimodal",
    "selection",
    "similarity",
    "sketches",
    "stats",
    "temporal",
]
