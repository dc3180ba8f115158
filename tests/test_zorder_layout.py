"""sink_zorder_layout's clustering claim, measured on the real files.

The registry query proves the rewrite is content-preserving; this
test proves it actually CLUSTERS: after the Morton-sorted write,
every output file must have a materially narrowed key range in BOTH
dimensions. A single-column sort cannot pass — it narrows its sort
key but leaves the other dimension at (almost) full span per file —
so this gate pins the property that makes 2D box predicates prune.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from fairy_spark.queries import QUERIES
from fairy_spark.queries.sources_io import _scratch


def _file_spans(path: str) -> list[dict[str, tuple[int, int]]]:
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in ("l_partkey", "l_suppkey"):
                    continue
                st = col.statistics
                lo[name] = min(lo.get(name, st.min), st.min)
                hi[name] = max(hi.get(name, st.max), st.max)
        if lo:
            spans.append({k: (lo[k], hi[k]) for k in lo})
    return spans


def test_zorder_files_narrow_both_dimensions(spark, sf_dir):
    QUERIES["sink_zorder_layout"](spark, str(sf_dir)).collect()
    out = _scratch(spark, str(sf_dir), "zorder")
    spans = _file_spans(out)
    assert len(spans) >= 4, spans
    pk_full = (
        min(s["l_partkey"][0] for s in spans),
        max(s["l_partkey"][1] for s in spans),
    )
    sk_full = (
        min(s["l_suppkey"][0] for s in spans),
        max(s["l_suppkey"][1] for s in spans),
    )
    pk_width = pk_full[1] - pk_full[0]
    sk_width = sk_full[1] - sk_full[0]
    both_narrow = 0
    for s in spans:
        pk_frac = (s["l_partkey"][1] - s["l_partkey"][0]) / pk_width
        sk_frac = (s["l_suppkey"][1] - s["l_suppkey"][0]) / sk_width
        # Every z-range narrows at least one dimension; most are full
        # sub-boxes. Quantile splits that straddle a top-bit flip of
        # the curve legitimately span one dimension (observed: 1 of 8
        # files full-pk × narrow-sk) — inherent to Morton order, so
        # the gate checks the aggregate, not the worst file. A
        # single-column sort still fails: it narrows ONE dimension on
        # every file and leaves the other at ~1.0 everywhere, so
        # both_narrow stays ~0.
        assert min(pk_frac, sk_frac) <= 0.6, (s, pk_frac, sk_frac)
        if pk_frac <= 0.8 and sk_frac <= 0.8:
            both_narrow += 1
    assert both_narrow >= int(0.7 * len(spans)), (both_narrow, spans)
