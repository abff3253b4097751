"""Hungarian matching for multi-query training (``--num_queries N``).

The reference inherits DETR's query machinery but REMOVED the matcher
(SURVEY.md §2.3: /root/reference/models/tubedetr.py:257-460 has no Hungarian
anywhere; with num_queries=1 predictions align positionally and
/root/reference/engine.py:107 just asserts the lengths). Its num_queries>1
path is non-functional — the query repeat is laid out query-major
(transformer.py:211-218 ``view(n_queries*t, b, f)``) while the padding mask
is laid out frame-major (transformer.py:227-238 ``query_mask[:, :dur*nq]``),
so the two disagree for nq>1 — and no published config uses it.

This framework completes the capability: frame-major multi-query decoding
plus per-frame Hungarian assignment of the single GT box per frame. STVG
has exactly one target box per annotated frame, so the general assignment
reduces to an argmin over queries — which IS the Hungarian optimum for one
target; the full rectangular solver is provided for generality and as the
oracle the fast path is tested against.

Note on inference: TubeDETR has no classification/objectness head — the
deeper reason the reference never uses nq>1. Our eval/postprocess path
reads query 0 by default; ``--nq_select sted`` instead ranks queries by the
sted head's own temporal-grounding confidence (the trained per-query signal
the matched-query sted loss produces; models/postprocess.py:
select_query_by_sted) and reads the winner. Training losses use the matched
query per frame either way.
"""

from __future__ import annotations

import numpy as np


def hungarian(cost: np.ndarray):
    """Exact minimum-cost assignment for a rectangular cost matrix.

    Returns ``(row_ind, col_ind)`` arrays of length ``min(n_rows, n_cols)``
    such that ``cost[row_ind, col_ind].sum()`` is minimal — the same
    contract as ``scipy.optimize.linear_sum_assignment``, implemented from
    the classic shortest-augmenting-path formulation with potentials
    (O(n^2 m)); pure numpy/python, no scipy dependency in this image.
    """
    cost = np.asarray(cost, dtype=np.float64)
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m

    INF = float("inf")
    u = np.zeros(n + 1)  # row potentials
    v = np.zeros(m + 1)  # col potentials
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to col j (1-idx)
    way = np.zeros(m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    row_of_col = p[1:]  # row assigned to each col, 0 = unassigned
    rows, cols = [], []
    for j in range(m):
        if row_of_col[j] > 0:
            rows.append(row_of_col[j] - 1)
            cols.append(j)
    rows, cols = np.asarray(rows), np.asarray(cols)
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    if transposed:
        return cols, rows
    return rows, cols


def match_single_target(cost):
    """Hungarian assignment specialised to ONE target per frame: the
    min-cost query. ``cost``: (..., n_queries) -> matched query index
    (...,). Exact (for m=1 the Hungarian optimum is the argmin); jit-able,
    so the match runs inside the training step."""
    import jax.numpy as jnp

    return jnp.argmin(cost, axis=-1)


def box_match_cost(pred_cxcywh, tgt_cxcywh, bbox_coef: float = 5.0,
                   giou_coef: float = 2.0):
    """DETR-style pairwise matching cost between per-frame query boxes and
    the frame's GT box: ``bbox_coef * L1 + giou_coef * (-GIoU)`` — the same
    weights as the loss (/root/reference/models/tubedetr.py:482-494), minus
    the class term the model does not have.

    pred: (..., nq, 4) cxcywh in [0,1]; tgt: (..., 4). Returns (..., nq).
    """
    import jax.numpy as jnp

    from tubedetr_tpu.core.boxes import (
        box_cxcywh_to_xyxy,
        paired_generalized_box_iou,
    )

    l1 = jnp.abs(pred_cxcywh - tgt_cxcywh[..., None, :]).sum(-1)
    giou = paired_generalized_box_iou(
        box_cxcywh_to_xyxy(pred_cxcywh),
        box_cxcywh_to_xyxy(
            jnp.broadcast_to(tgt_cxcywh[..., None, :], pred_cxcywh.shape)
        ),
    )
    return bbox_coef * l1 + giou_coef * (-giou)
