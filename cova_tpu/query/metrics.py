"""Query-accuracy metrics (L6).

Port of the reference analytics layer (reference: parse/parse.py,
parse/common/time.py): binary-predicate (BP) and count (GC) queries over
the aggregator CSVs vs a full-decode ground truth, globally and on a
quadrant region, with per-dataset exclusion regions.

Timestamps here are float seconds; the evaluation grid keeps the
reference's structure of 3 slots per 100 ms (common/time.py:11-21).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Iterable, Sequence

import numpy as np
import pandas as pd

SLOT = 1.0 / 30.0
STEP3 = 0.1


def arange_ts(start: float, end: float) -> np.ndarray:
    """3 evaluation slots per 100 ms (reference: common/time.py arange_ts)."""
    base = np.arange(start, end, STEP3)
    out = np.empty(base.size * 3)
    out[0::3] = base
    out[1::3] = base + SLOT
    out[2::3] = base + 2 * SLOT
    return out


def load_boxes_csv(path) -> pd.DataFrame:
    df = pd.read_csv(path)
    df = df.set_index("timestamp", drop=True).sort_index()
    return df


def load_cova(output_dir) -> pd.DataFrame:
    root = pathlib.Path(output_dir)
    frames = [pd.read_csv(root / "assoc.csv")]
    st = root / "stationary.csv"
    if st.exists():
        frames.append(pd.read_csv(st))
    df = pd.concat(frames)
    if len(df) == 0:
        df = pd.DataFrame(
            columns=["left", "top", "width", "height", "timestamp", "class_id"]
        )
    return df.set_index("timestamp", drop=True).sort_index()


def exclude_regions(df: pd.DataFrame, regions: Iterable) -> pd.DataFrame:
    """Drop detections fully inside any exclusion rectangle
    (reference: parse.py get_exclude_df — noise suppression for small
    unstable YOLO detections)."""
    df = df.copy()
    df["right"] = df["left"] + df["width"]
    df["bottom"] = df["top"] + df["height"]
    for (left, top), (right, bottom) in regions:
        idx = (
            (df["left"] >= left)
            & (df["top"] >= top)
            & (df["right"] <= right)
            & (df["bottom"] <= bottom)
        )
        df = df[~idx].copy()
    return df


def local_region(
    df: pd.DataFrame, region: str, width: int = 1280, height: int = 640
) -> pd.DataFrame:
    """Quadrant filter (reference: parse.py get_local_df — note the
    reference's 'lower right' uses left <= w/2, preserved)."""
    df = df.copy()
    df["right"] = df["left"] + df["width"]
    df["bottom"] = df["top"] + df["height"]
    if region == "upper left":
        idx = (df["right"] <= width / 2) & (df["bottom"] <= height / 2)
    elif region == "upper right":
        idx = (df["left"] >= width / 2) & (df["bottom"] <= height / 2)
    elif region == "lower left":
        idx = (df["right"] <= width / 2) & (df["top"] >= height / 2)
    elif region == "lower right":
        idx = (df["left"] <= width / 2) & (df["top"] >= height / 2)
    else:
        raise ValueError(f"unknown region {region!r}")
    return df[idx]


def calculate_query(
    df: pd.DataFrame, ts_range: np.ndarray, targets: Sequence[int]
):
    """BP series + GC scalar (reference: parse.py calculate_query)."""
    if len(df) == 0:
        bp = pd.DataFrame(False, index=ts_range, columns=["class_id"])
        return bp, 0.0
    grouped = df.groupby(df.index)["class_id"].agg(list)
    binary = grouped.apply(lambda l: np.isin(l, targets).any())
    bp = pd.DataFrame(False, index=ts_range, columns=["class_id"])
    bp.update(pd.DataFrame(binary))
    bp = bp.ffill().bfill()

    counts = grouped.apply(lambda l: int(np.isin(l, targets).sum()))
    gc_df = pd.DataFrame(0, index=ts_range, columns=["class_id"])
    gc_df.update(pd.DataFrame(counts))
    return bp, float(gc_df.values.mean())


@dataclasses.dataclass
class QueryResult:
    bp_accuracy: float
    gc_error: float
    bp_accuracy_local: float
    gc_error_local: float
    num_slots: int


def parse_query(
    gt_df: pd.DataFrame,
    cova_df: pd.DataFrame,
    duration_seconds: float,
    targets: Sequence[int],
    exclude: Iterable = (),
    region: str = "upper left",
    frame_size=(1280, 640),
    ts_start: float = 0.0,
    ts_end: float | None = None,
) -> QueryResult:
    """Full BP/GC/BPL/GCL evaluation (reference: parse.py parse_query).

    ts_start/ts_end restrict the evaluation grid to slots in
    [ts_start, ts_end) — used for held-out evaluation (train/tune on a
    clip prefix, score the unseen suffix; the offline analog of the
    reference's train-one-day/eval-other-days methodology,
    parse/accuracy.py:27-92). The grid is still generated from 0 and
    then filtered, so slot values stay float-identical to the full-clip
    evaluation (detection timestamps must match grid values exactly for
    pd.update to register them)."""
    ts_max = max(
        duration_seconds,
        float(gt_df.index.max()) if len(gt_df) else 0.0,
    )
    ts_range = arange_ts(0.0, ts_max)
    if ts_start > 0.0:
        ts_range = ts_range[ts_range >= ts_start - 1e-9]
    if ts_end is not None:
        ts_range = ts_range[ts_range < ts_end - 1e-9]

    gt = exclude_regions(gt_df, exclude)
    cova = exclude_regions(cova_df, exclude)

    gt_bp, gt_gc = calculate_query(gt, ts_range, targets)
    cv_bp, cv_gc = calculate_query(cova, ts_range, targets)
    bp_acc = float((gt_bp.values == cv_bp.values).sum() / len(gt_bp))
    gc_err = abs(gt_gc - cv_gc)

    gt_l = local_region(gt, region, *frame_size)
    cv_l = local_region(cova, region, *frame_size)
    gt_bp_l, gt_gc_l = calculate_query(gt_l, ts_range, targets)
    cv_bp_l, cv_gc_l = calculate_query(cv_l, ts_range, targets)
    bp_acc_l = float((gt_bp_l.values == cv_bp_l.values).sum() / len(gt_bp_l))
    gc_err_l = abs(gt_gc_l - cv_gc_l)

    return QueryResult(bp_acc, gc_err, bp_acc_l, gc_err_l, len(ts_range))
