"""Ray-Data-native full-text index + BM25 query engine for transcript tables.

A from-scratch rebuild of the query/data-processing capabilities of the
jcpoir/Search-Engine reference (see SURVEY.md) on ray.data Datasets:
zero-copy Arrow batch transforms, actor-pool stateful stages, term-keyed
merge shuffle with doc-range salting, varbyte posting compression,
BM25 top-k with deterministic tie-breaks, per-partition checkpoints.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import search_engine_ray` light — Ray
    and pyarrow load only when a component is first touched)."""
    _API = {
        "build_index": ("search_engine_ray.pipelines.build_index", "build_index"),
        "extend_index": ("search_engine_ray.pipelines.build_index", "extend_index"),
        "compact_index": ("search_engine_ray.pipelines.build_index", "compact_index"),
        "LocalIndex": ("search_engine_ray.stages.query", "LocalIndex"),
        "ShardedSearcher": ("search_engine_ray.pipelines.search", "ShardedSearcher"),
        "DocShardedSearcher": ("search_engine_ray.pipelines.search", "DocShardedSearcher"),
        "evaluate_queries": ("search_engine_ray.pipelines.search", "evaluate_queries"),
        "materialize_results": ("search_engine_ray.pipelines.search", "materialize_results"),
        "SearchServer": ("search_engine_ray.serve", "SearchServer"),
        "read_transcripts": ("search_engine_ray.sources.transcripts", "read_transcripts"),
        "IndexConfig": ("search_engine_ray.config", "IndexConfig"),
        "pagerank": ("search_engine_ray.pipelines.pagerank", "pagerank"),
    }
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'search_engine_ray' has no attribute {name!r}")
