#!/usr/bin/env python
"""Format realism-table CSVs into the paper's LaTeX row / averaged views.

Reference counterpart: /root/reference/scripts/format_results.py. Reads a
`realism_table.csv` produced by realism_test_bench.sh compute_scores and
prints (a) the metric row in reference-mode order and (b) reinsertion
(id/track) vs replacement (in/cross-domain) averages.

Usage: python scripts/format_results.py results/.../realism_table.csv
"""
from __future__ import annotations

import sys

import pandas as pd

ORDER = ["id-ref", "track-ref", "in-domain-ref", "cross-domain-ref"]


def main(path: str):
    df = pd.read_csv(path).drop_duplicates(subset="Reference Type")
    present = [m for m in ORDER if m in set(df["Reference Type"])]
    df_sorted = df.set_index("Reference Type").loc[present].reset_index()

    metric_cols = [
        c for c in ("FID", "LPIPS", "CLIP", "D-LPIPS", "I-LPIPS", "FRD")
        if c in df_sorted.columns
    ]
    rounding = {"FID": 2, "LPIPS": 3, "CLIP": 2, "D-LPIPS": 3, "I-LPIPS": 3,
                "FRD": 2}
    row = " & ".join(
        str(v)
        for v in df_sorted[metric_cols]
        .round({k: v for k, v in rounding.items() if k in metric_cols})
        .values.reshape(-1)
    )
    print("latex row:", row)

    def avg(modes):
        sel = df[df["Reference Type"].isin(modes)]
        return sel[metric_cols].mean() if len(sel) else None

    re_avg = avg(["id-ref", "track-ref"])
    rep_avg = avg(["in-domain-ref", "cross-domain-ref"])
    if re_avg is not None:
        print("reinsertion avg:", re_avg.round(3).to_dict())
    if rep_avg is not None:
        print("replacement avg:", rep_avg.round(3).to_dict())


if __name__ == "__main__":
    main(sys.argv[1])
