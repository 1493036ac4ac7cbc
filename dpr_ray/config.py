"""Engine constants and BM25 parameters.

BM25 parameters k1=0.9, b=0.4 follow the Lucene/Anserini configuration the
DPR paper's BM25 baseline uses (DPR paper Table 2 / §4.3; see BASELINE.md).
The idf is the Lucene BM25 idf, ln(1 + (N - df + 0.5)/(df + 0.5)), which is
always positive; the (k1+1) numerator factor is kept (classic/Anserini form).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BM25Params:
    k1: float = 0.9
    b: float = 0.4


# Posting-list physical layout ------------------------------------------------
# Postings are stored docid-sorted, split into fixed-size blocks; each block
# carries a conservative float32 upper bound of the tf-normalization component
# (block-max) so WAND can skip blocks without ever under-estimating a score.
BLOCK_SIZE = 128

# Number of hash buckets the term space is partitioned into on disk
# (segments/tbucket=<i>/...). One parquet partition dir per bucket; queries
# prune to the buckets their terms hash into. At 10^12-doc scale this knob
# grows with vocabulary so a single bucket's file stays ~100s of MB.
DEFAULT_TERM_BUCKETS = 16

# Skew handling for the groupby(term) shuffle: a term whose (pre-aggregated)
# df exceeds this budget is salted into ceil(df / budget) docid-range salts so
# no single map_groups group exceeds the budget. At test scale this is small
# so the salting code path actually executes; at 100 TB set it so a group's
# postings fit comfortably in a task heap (e.g. 5-10M postings).
DEFAULT_GROUP_BUDGET = 50_000

# Default retrieval depth (reference: conf/dense_retriever.yaml `n_docs: 100`).
DEFAULT_TOP_K = 100
