"""Topological map partitioning by spectral cuts over the SSO graph.

The reference partitions the keyframe graph into topological areas with
MRPT's `RecursiveSpectralPartition(SSO, parts, threshold=0.8, min_size=3)`
(reference `include/TopologicalMap360.h:391-411`), where SSO is the
sensed-space-overlap (co-visibility) matrix maintained per area
(`getVicinitySSO:134`).  Here the whole map keeps ONE dense (N, N) SSO
matrix (`Map360.sso`) and partitioning is recursive normalized-cut
bisection via the Fiedler vector of the masked submatrix — a tiny symmetric
eigenproblem, done host-side on numpy (it runs every few keyframes and N is
hundreds)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalized_cut_value(w: np.ndarray, part: np.ndarray) -> float:
    """NCut(A, B) = cut(A,B)/assoc(A,V) + cut(A,B)/assoc(B,V)."""
    a = part
    b = ~part
    cut = w[np.ix_(a, b)].sum()
    assoc_a = w[a].sum()
    assoc_b = w[b].sum()
    if assoc_a <= 0 or assoc_b <= 0:
        return np.inf
    return float(cut / assoc_a + cut / assoc_b)


def _fiedler_bisect(w: np.ndarray) -> np.ndarray:
    """Bisect by the sign of the Fiedler vector of the normalized Laplacian."""
    d = w.sum(axis=1)
    d_safe = np.maximum(d, 1e-9)
    d_inv_sqrt = 1.0 / np.sqrt(d_safe)
    lap = np.eye(len(w)) - (d_inv_sqrt[:, None] * w * d_inv_sqrt[None, :])
    vals, vecs = np.linalg.eigh(lap)
    fiedler = vecs[:, 1] if len(vals) > 1 else vecs[:, 0]
    # choose the threshold along the sorted Fiedler values minimizing NCut
    order = np.argsort(fiedler)
    best, best_part = np.inf, fiedler >= np.median(fiedler)
    for cut_at in range(1, len(order)):
        part = np.zeros(len(w), bool)
        part[order[:cut_at]] = True
        v = normalized_cut_value(w, part)
        if v < best:
            best, best_part = v, part
    return best_part


def recursive_spectral_partition(
    sso: np.ndarray,
    threshold: float = 0.8,
    min_size: int = 3,
) -> np.ndarray:
    """Partition keyframes into areas; returns int area id per keyframe.

    Recursion matches the reference semantics: keep splitting a group while
    the normalized-cut cost of its best bisection is below `threshold` and
    both halves have at least `min_size` nodes.
    """
    n = len(sso)
    labels = np.zeros(n, dtype=np.int32)
    next_label = [1]

    def split(idx: np.ndarray):
        if len(idx) < 2 * min_size:
            return
        w = sso[np.ix_(idx, idx)]
        if w.sum() <= 0:
            return
        part = _fiedler_bisect(w)
        if part.sum() < min_size or (~part).sum() < min_size:
            return
        if normalized_cut_value(w, part) >= threshold:
            return
        b_idx = idx[~part]
        labels[b_idx] = next_label[0]
        next_label[0] += 1
        split(idx[part])
        split(b_idx)

    split(np.arange(n))
    # compact labels to 0..k-1 in first-seen order
    uniq, labels = np.unique(labels, return_inverse=True)
    return labels.astype(np.int32)


def partition_map(
    map360, threshold: float = 0.8, min_size: int = 3, sso=None, n_kf=None
):
    """Repartition a Map360's live keyframes; returns (area ids (N,), count).

    Equivalent of `TopologicalMap360::Partitioner` + `ArrangeGraphSSO`
    (reference `TopologicalMap360.h:391-411,170-368`) — but since the SSO
    matrix is global and dense, no block rearrangement is needed; areas are
    just relabeled.  `sso`: optionally the ALREADY-FETCHED host SSO matrix
    (the async keyframe event combines this fetch with the optimizer's);
    `n_kf`: optionally the host-mirrored live count, so a caller that
    already tracks it (the tracker's `_n_kf_host`) avoids the blocking
    device fetch — one tunnel round trip per partition on a remote chip."""
    n_kf = int(map360.n_kf) if n_kf is None else int(n_kf)
    full = np.zeros(map360.area.shape[0], dtype=np.int32)
    if n_kf == 0:
        return full, 1
    sso = np.asarray(map360.sso if sso is None else sso)[:n_kf, :n_kf].astype(np.float64)
    sso = np.maximum(sso, sso.T)
    labels = recursive_spectral_partition(sso, threshold, min_size)
    full[:n_kf] = labels
    return full, int(labels.max()) + 1


def representative_keyframes(map360) -> np.ndarray:
    """Elect one representative keyframe per area — the member with the
    largest total in-area co-visibility (SSO row sum), i.e. the keyframe
    that senses most of its area's space.  The reference keeps these as
    `Map360::vSelectedKFs` (`include/Map360.h:66-76`) and the loop-closure
    thread scans only them for non-neighbor areas
    (`include/LoopClosure360.h:289-294`).

    Returns an (n_areas,) int array of keyframe indices (-1 for an area with
    no live members)."""
    n_kf = int(map360.n_kf)
    n_areas = int(map360.n_areas)
    # score each keyframe on DEVICE (sum of symmetric SSO over same-area
    # members) and pull back only the (N,) scores — pulling the full (N, N)
    # SSO matrix to host per keyframe event scales quadratically with map
    # capacity for no reason
    scores, area_d = _rep_scores(map360.sso, map360.area, map360.n_kf)
    scores = np.asarray(scores)[:n_kf]
    area = np.asarray(area_d)[:n_kf]
    reps = np.full(n_areas, -1, np.int64)
    for a in range(n_areas):  # n_areas is small (tens at most)
        members = np.where(area == a)[0]
        if len(members):
            reps[a] = members[int(np.argmax(scores[members]))]
    return reps


@jax.jit
def _rep_scores(sso, area, n_kf):
    """Per-keyframe total same-area co-visibility (symmetric SSO row sum
    restricted to the keyframe's own area), masked to live keyframes."""
    idx = jnp.arange(area.shape[0])
    live = idx < n_kf
    s = jnp.maximum(sso, sso.T)
    same = (area[:, None] == area[None, :]) & live[None, :]
    return jnp.sum(jnp.where(same, s, 0.0), axis=1), area


# Static bound on distinct areas inside the device kernels: keeps the
# (A, A) adjacency and (A, N) membership temporaries O(64 * ...) instead of
# O(capacity^2) as the keyframe capacity auto-grows (MapConfig.max_areas is
# 64; the spectral partitioner produces tens of areas in practice).  Area
# ids at or beyond the cap alias into the last slot — an over-PERMISSIVE
# degradation (aliased areas gate as one), never a wrong exclusion.
MAX_AREAS_DEVICE = 64


def area_adjacency_device(area, edges_ij, emask, max_areas: int):
    """(A, A) bool area adjacency (incl. self) computed ON DEVICE from the
    live edge list — the device-side form of `neighbor_areas` used by the
    per-keyframe candidate gates so no O(capacity) arrays cross the host
    link per keyframe event.  `max_areas` is clamped to MAX_AREAS_DEVICE."""
    cap = min(max_areas, MAX_AREAS_DEVICE)
    area = jnp.minimum(area, cap - 1)
    ev = emask & (edges_ij[:, 0] >= 0)
    ai = jnp.where(ev, area[jnp.clip(edges_ij[:, 0], 0, None)], 0)
    aj = jnp.where(ev, area[jnp.clip(edges_ij[:, 1], 0, None)], 0)
    d = jnp.arange(cap)
    neigh = jnp.zeros((cap, cap), bool).at[d, d].set(True)
    neigh = neigh.at[ai, aj].max(ev)
    return neigh.at[aj, ai].max(ev)


def representative_mask_device(sso, area, n_kf):
    """(N,) bool — is keyframe its area's representative (device-side form
    of `representative_keyframes`: per-area argmax of the same-area SSO row
    sum).  Membership is built at the MAX_AREAS_DEVICE-bounded area cap."""
    n = area.shape[0]
    cap = min(n, MAX_AREAS_DEVICE)
    area = jnp.minimum(area, cap - 1)
    idx = jnp.arange(n)
    live = idx < n_kf
    s = jnp.maximum(sso, sso.T)
    same = (area[:, None] == area[None, :]) & live[None, :] & live[:, None]
    scores = jnp.sum(jnp.where(same, s, 0.0), axis=1)
    member = (area[None, :] == jnp.arange(cap)[:, None]) & live[None, :]
    area_scores = jnp.where(member, scores[None, :], -1.0)
    reps = jnp.argmax(area_scores, axis=1)
    has_members = jnp.any(member, axis=1)
    return jnp.zeros((n,), bool).at[reps].max(has_members)


def neighbor_areas(map360) -> np.ndarray:
    """(A, A) bool adjacency between areas via existing edges (the
    reference's `vsNeighborAreas`)."""
    n_areas = int(map360.n_areas)
    area = np.asarray(map360.area)
    out = np.eye(n_areas, dtype=bool)
    edges = np.asarray(map360.graph.edges_ij)
    emask = np.asarray(map360.graph.emask)
    live = edges[emask & (edges[:, 0] >= 0)]
    ai, aj = area[live[:, 0]], area[live[:, 1]]
    out[ai, aj] = True
    out[aj, ai] = True
    return out
