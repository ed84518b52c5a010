"""Ray-Data-native full-text index + BM25 query engine for transcript tables.

A from-scratch rebuild of the query/data-processing capabilities of the
jcpoir/Search-Engine reference (see SURVEY.md) on ray.data Datasets:
zero-copy Arrow batch transforms, actor-pool stateful stages, term-keyed
merge shuffle with doc-range salting, varbyte posting compression,
BM25 top-k with deterministic tie-breaks, per-partition checkpoints.
"""

__version__ = "0.1.0"
