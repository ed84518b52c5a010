"""Engine-wide configuration.

Constants mirror the reference engine's indexer/search knobs
(`/root/reference/src/cis5550/jobs/Indexer.java:33-38`,
`/root/reference/src/cis5550/jobs/Search.java:24-55`); everything else
is Ray-Data-specific physical tuning.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, asdict

# Reference constants (Indexer.java:33)
MAX_TEXT_LEN = 10_000  # MAX_PAGE_LEN: text truncated to this many chars
MAX_WORD_LEN = 20      # MAX_WORD_LEN: longer tokens are not indexed

# Index-time skip list (Indexer.java:36-38)
SKIP_WORDS = frozenset(
    ["http", "https", "com", "net", "edu", "org", "gov", "www", "xml", "ttl", "xmlj", "rdf"]
)

# Query-time stopword list (Search.java:38-55, 150 words)
STOPWORDS = frozenset(
    """a an the and but or for nor so yet at by in of on to up as it is
    be am are was were been do does did has have had can could may might
    must shall should will would ought about above across after against
    along among around before behind below beneath beside between beyond
    concerning considering despite during except following inside into
    like near next off onto outside over past regarding round since
    through throughout toward under underneath unlike until upon with
    within without according alongside also any anybody anyone anything
    both each either everybody everyone everything few he her hers
    herself him himself his i it's its itself many me mine more most my
    myself neither no nobody none nothing one other others our ours
    ourselves several she some somebody someone something theirs them
    themselves these they this those us we what whatever which whichever
    who whoever whom whomever whose you your yours yourself yourselves""".split()
)

# BM25 parameters (SURVEY.md §7.0 normative scoring)
BM25_K1 = 1.2
BM25_B = 0.75

# Reference default result cutoff (Search.java:25 n_results)
DEFAULT_TOP_K = 200

# Stopword-only queries re-enable stopwords with a score penalty
# (Search.java:24 stopword_penalty, :209-214)
STOPWORD_PENALTY = 0.05

# Wildcard ('prefix*') query terms expand to at most this many
# dictionary terms, chosen by (df desc, term asc) — the deterministic
# analog of Lucene's multi-term rewrite cap. Bounds per-query decode
# work on short prefixes at any corpus size; selection uses the GLOBAL
# dictionary, so doc-range shards pick identical expansion sets and
# sharded results stay bit-identical to unsharded evaluation.
WILDCARD_MAX_EXPANSIONS = 64

# Reciprocal-rank fusion constant (Cormack et al.'s standard k=60)
# shared by the batch hybrid op and the POST /hybrid serving route.
RRF_K = 60

# Content hashing for dedup/shingling. False (default) = md5-60, bit-
# identical to the DuckDB oracle twin — every gate entry relies on it.
# True = polars' vectorized xxhash64 (no per-string Python loop) for
# production runs where SQL mirrorability is not needed; flips the
# concrete hash values but not any operator's semantics.
#
# Initialized from SERAY_FAST_HASH so it reaches Ray WORKERS: the UDFs
# pickle by module reference, so each worker re-imports this module and
# re-reads the env it inherited from the cluster launch — mutating the
# module attribute on the driver after ray.init only affects
# driver-local code. Export SERAY_FAST_HASH=1 before starting Ray for
# a distributed fast-hash run.
FAST_CONTENT_HASH = os.environ.get("SERAY_FAST_HASH", "") == "1"

# On-disk parquet codec for engine-written index stores (docs store,
# posting segments, dictionary). zstd level 1 measured the 2.4M index
# 1.52x smaller end-to-end than parquet's default snappy (460 -> 303
# MB) with equal-or-faster encode AND decode (BASELINE.md round-5
# notes): fewer bytes through the disk on the build's widest write and
# on every serving row-group fetch — the 24M serving tail is
# postings-fetch-bound, so payload bytes on disk are the p95 lever.
# Env-overridable (read at worker import, like SERAY_FAST_HASH) so
# codec A/Bs are scriptable; parquet is self-describing, so indexes
# written under either codec read interchangeably.
PARQUET_CODEC = os.environ.get("SERAY_PARQUET_CODEC", "zstd")
PARQUET_CODEC_LEVEL = int(os.environ.get("SERAY_PARQUET_CODEC_LEVEL", "1"))
PARQUET_ARGS = {"compression": PARQUET_CODEC}
if PARQUET_CODEC in ("zstd", "gzip", "brotli"):  # snappy/lz4 take no level
    PARQUET_ARGS["compression_level"] = PARQUET_CODEC_LEVEL


@dataclass(frozen=True)
class IndexConfig:
    """Logical + physical knobs for an index build.

    ``doc_bucket_size`` is the salting / segmentation unit: posting
    lists are segmented by ``doc_id // doc_bucket_size`` and the merge
    shuffle groups on ``(term, bucket)``, so no merge group ever sees
    more than ``doc_bucket_size / batch_size`` partials regardless of a
    term's document frequency — this is the explicit skew handling for
    stopword-like hot terms (SURVEY.md §7.4).
    """

    max_text_len: int = MAX_TEXT_LEN
    max_word_len: int = MAX_WORD_LEN
    stemming: bool = True          # index raw + Porter-stemmed terms (Indexer.java:256-283)
    strip_html: bool = False       # bracket-counting tag stripper (extract_html, Indexer.java:71-105);
                                   # off by default: transcripts are plain text
    positions: bool = True         # store varbyte position blocks (split_page_locs capability)
    index_role_tool: bool = False  # prepend role/tool tokens (analog of URL-token indexing, Indexer.java:236-238)
    store_prior: bool = False      # per-posting doc-prior stream (the reference's pagerank-in-posting
                                   # payload, Search.java:89-108 "url^pagerank tf"); prior = char length
                                   # of the untruncated turn text, stored varbyte like doclen
    doc_bucket_size: int = 1 << 17
    batch_size: int = 4096
    k1: float = BM25_K1
    b: float = BM25_B

    def to_json(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_json(d: dict) -> "IndexConfig":
        return IndexConfig(**d)
