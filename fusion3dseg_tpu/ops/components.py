"""Class-constrained connected components via parallel label propagation.

Capability parity with reference segUtils/cv.py split_into_instances
(:402-500): partition each semantic class's points into connected clusters
over the radius-neighbor graph, pool clusters smaller than min_pts_per_inst
into one "small disjoint" instance of category `nclasses` (cv.py:481-489),
give non-instance (semantic) classes one id each (cv.py:463-471).

The reference runs a pure-Python BFS queue per cluster (cv.py:425-440) —
inherently sequential. Here: iterative min-label relaxation with pointer
jumping over a fixed-degree [N, K] adjacency, inside lax.while_loop. Each
sweep halves (at least) the label-tree height; with jumping the iteration
count is O(log N) in practice, every sweep a fully-vectorized gather on TPU.

The final id numbering / info bookkeeping is host-side (tiny, O(unique)).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_iters",))
def propagate_labels(
    adj: jax.Array,
    classes: jax.Array,
    valid: Optional[jax.Array] = None,
    max_iters: int = 512,
) -> jax.Array:
    """Min-label propagation restricted to same-class edges.

    Args:
      adj: [N, K] int32 neighbor indices, -1 padded.
      classes: [N] int32 point classes; edges connect equal classes only
        (reference cv.py:433: BFS skips points of a different class).
      valid: [N] bool optional mask; invalid points form singleton clusters.
      max_iters: safety cap on relaxation sweeps.

    Returns:
      labels: [N] int32 — representative (minimum) point index per
        class-connected component.
    """
    n = adj.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    neigh_ok = (adj >= 0) & valid[:, None]
    adj_safe = jnp.where(adj >= 0, adj, 0)
    same = neigh_ok & (classes[adj_safe] == classes[:, None]) & valid[adj_safe]

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        neigh_lab = jnp.where(same, labels[adj_safe], jnp.iinfo(jnp.int32).max)
        new = jnp.minimum(labels, jnp.min(neigh_lab, axis=-1))
        # pointer jumping: compress label chains (2 jumps measured best on
        # a 104k-point room scene — deeper compression doesn't cut sweeps,
        # the loop is propagation-bound, and extra jumps just add passes)
        new = new[new]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (ids, jnp.bool_(True), 0))
    return labels


def symmetrize_adjacency(adj: np.ndarray) -> np.ndarray:
    """Add every missing reverse edge to a fixed-degree [N, K] adjacency.

    Returns [N, K'] int32 (-1 padded) whose edge set is the symmetric
    closure of the input's; K' grows to the maximum resulting degree, rows
    are sorted by neighbor index (order is irrelevant to component
    propagation), and duplicate edges are collapsed.
    """
    adj = np.asarray(adj)
    n, k = adj.shape if adj.ndim == 2 else (len(adj), 0)
    if n == 0 or k == 0:
        return np.zeros((n, 0), np.int32)
    src = np.repeat(np.arange(n, dtype=np.int64), k)
    dst = adj.astype(np.int64).ravel()
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    a = (key // n).astype(np.int32)
    b = (key % n).astype(np.int32)
    counts = np.bincount(a, minlength=n)
    k2 = int(counts.max()) if len(counts) else 0
    out = np.full((n, k2), -1, np.int32)
    row_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(a)) - row_start[a]
    out[a, slot] = b
    return out


def split_into_instances(
    classes: np.ndarray,
    adj: jax.Array | np.ndarray,
    nclasses: int = 133,
    instance_classes: Optional[Sequence[int]] = None,
    minimum_points: int = 1,
    max_iters: int = 512,
    backend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, List[Dict], np.ndarray]:
    """Full instance split matching reference cv.split_into_instances.

    Args:
      classes: [N] int point classes.
      adj: [N, K] int32 fixed-degree adjacency (-1 padded). Build with
        fusion3dseg_tpu.ops.neighbors.radius_graph (device) or the native
        C++ grid-hash (fusion3dseg_tpu.io.native).
      nclasses: the "unclassified" category id.
      instance_classes: classes to split into instances; all other observed
        classes become single semantic ids. None -> every class except
        `nclasses` is an instance class (reference cv.py:449-457).
      minimum_points: clusters below this size pool into the small-disjoint
        instance with category `nclasses` (reference cv.py:481-489).
      backend: "auto" (native C++ union-find over the adjacency when the
        library is available — ~30x faster than the device propagation for
        a host-resident graph — else device), "native", or "device". Both
        produce component id = minimum member point index.

    Edge-direction semantics: components are WEAKLY connected — every
    stored edge (i -> adj[i][k]) counts in both directions. Union-find is
    undirected by construction; the device propagation path symmetrizes
    the adjacency first so the two backends agree on ANY input, including
    degree-capped adjacencies whose reverse edge was dropped (review
    finding r2). This deviates from the reference's BFS over stored
    out-edges only (cv.py:425-440) exactly on such non-reciprocal rows —
    where the reference's own answer depends on visit order; the physical
    radius relation is symmetric, so the undirected reading is taken as
    canonical.

    Returns:
      (unique instance ids [M], per-point ids [N], info list of
       {'id','isthing','category_id','area'}, updated classes [N])
      — the reference's exact return contract (cv.py:419-423).
    """
    classes = np.asarray(classes)
    n = len(classes)

    allclasses = np.unique(classes)
    if instance_classes is None:
        instance_classes = allclasses[allclasses != nclasses]
        semantic_classes = [nclasses] if (allclasses == nclasses).any() else []
    else:
        instance_classes = np.asarray(list(instance_classes))
        semantic_classes = np.setdiff1d(allclasses, instance_classes).tolist()

    # One pass labels every class's components at once: native union-find
    # on host when available, else the device min-label propagation.
    # `adj` may also be a ragged CSR pair (offsets [N+1], flat) — the
    # stored per-point adjacency lists are ragged, and densifying to the
    # single densest point's degree costs O(N) host passes plus an
    # [N, max_degree] table (review finding r3).
    is_csr = isinstance(adj, tuple) and len(adj) == 2
    labels = None
    if backend in ("auto", "native"):
        from fusion3dseg_tpu.io import native

        if is_csr:
            labels = native.components_from_csr(
                adj[0], adj[1], classes.astype(np.int32)
            )
        else:
            labels = native.components_from_adjacency(
                np.asarray(adj), classes.astype(np.int32)
            )
        if labels is None and backend == "native":
            raise RuntimeError("native components unavailable")
    if is_csr and labels is None:
        # device fallback needs the dense form; vectorized densify
        from fusion3dseg_tpu.ops import neighbors as _nb

        adj = _nb.csr_to_adjacency(adj[0], adj[1])
    if labels is None:
        # symmetrize so directed min-label propagation matches union-find's
        # undirected components on degree-capped adjacencies
        labels = np.asarray(
            propagate_labels(
                jnp.asarray(symmetrize_adjacency(np.asarray(adj)), jnp.int32),
                jnp.asarray(classes, jnp.int32),
                max_iters=max_iters,
            )
        )

    return _assemble_instances(
        classes, labels, nclasses, instance_classes, semantic_classes,
        minimum_points,
    )


def split_into_instances_by_radius(
    classes: np.ndarray,
    points: np.ndarray,
    radius: float,
    nclasses: int = 133,
    instance_classes: Optional[Sequence[int]] = None,
    minimum_points: int = 1,
) -> Tuple[np.ndarray, np.ndarray, List[Dict], np.ndarray]:
    """split_into_instances without materializing an adjacency: one native
    grid pass unions every same-class point pair within `radius` directly
    (io/native.py connected_components), skipping the k-NN build's
    distance sort and [N, k] table entirely.

    Connectivity semantics: the FULL radius relation — a superset of any
    degree-capped adjacency's edges, and exactly the relation the
    reference's KD-tree lists encode (fusion.py:374-377). Measured on the
    e2e bench cloud (103k pts, r=0.10): 0.08 s vs 0.23 s for
    radius_graph(k=16) + union-find, identical instances.

    Same return contract as split_into_instances.
    """
    classes = np.asarray(classes)
    allclasses = np.unique(classes)
    if instance_classes is None:
        instance_classes = allclasses[allclasses != nclasses]
        semantic_classes = [nclasses] if (allclasses == nclasses).any() else []
    else:
        instance_classes = np.asarray(list(instance_classes))
        semantic_classes = np.setdiff1d(allclasses, instance_classes).tolist()

    from fusion3dseg_tpu.io import native

    labels = native.connected_components(
        np.asarray(points, np.float32), float(radius),
        labels=classes.astype(np.int32),
    )
    return _assemble_instances(
        classes, labels, nclasses, instance_classes, semantic_classes,
        minimum_points,
    )


def _assemble_instances(
    classes: np.ndarray,
    labels: np.ndarray,
    nclasses: int,
    instance_classes,
    semantic_classes,
    minimum_points: int,
) -> Tuple[np.ndarray, np.ndarray, List[Dict], np.ndarray]:
    """Shared tail of the split: component labels (root = min member index,
    already restricted to same-class unions) -> instance ids, info dicts
    and updated classes (reference cv.py:419-423 contract)."""
    n = len(classes)
    out_classes = classes.copy()
    ids = np.zeros(n, np.int32)
    info: List[Dict] = []
    small_disjoint_id = None
    ninstances = 0

    # semantic (non-instance) classes: one id each (reference cv.py:463-471)
    for cls_ in semantic_classes:
        mask = classes == cls_
        ids[mask] = ninstances
        if cls_ == nclasses:
            small_disjoint_id = ninstances
        info.append(
            {"id": ninstances, "isthing": False, "category_id": int(cls_), "area": int(mask.sum())}
        )
        ninstances += 1

    inst_set = set(int(c) for c in np.asarray(instance_classes).ravel())
    inst_mask = np.isin(classes, list(inst_set)) if inst_set else np.zeros(n, bool)

    # components among instance-class points
    comp_labels = labels[inst_mask]
    comp_points = np.nonzero(inst_mask)[0]
    if len(comp_points):
        uniq, inverse, counts = np.unique(comp_labels, return_inverse=True, return_counts=True)
        # deterministic order: by representative (minimum point index), which
        # np.unique already yields sorted. Group membership via one stable
        # argsort instead of O(U*N) boolean scans.
        order = np.argsort(inverse, kind="stable")
        groups = np.split(comp_points[order], np.cumsum(counts)[:-1])
        for rep, area, members in zip(uniq, counts, groups):
            if area < minimum_points:
                if small_disjoint_id is None:
                    small_disjoint_id = ninstances
                    info.append(
                        {"id": ninstances, "isthing": True, "category_id": int(nclasses), "area": 0}
                    )
                    ninstances += 1
                info[small_disjoint_id]["area"] += int(area)
                ids[members] = small_disjoint_id
                out_classes[members] = nclasses
            else:
                cat = int(classes[rep])
                info.append(
                    {"id": ninstances, "isthing": True, "category_id": cat, "area": int(area)}
                )
                ids[members] = ninstances
                ninstances += 1

    return np.unique(ids), ids, info, out_classes


def floodfill_level(
    adj: jax.Array | np.ndarray,
    seeds: np.ndarray,
    max_level: int,
    classes: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Distance(hop)-bounded flood fill from seed points.

    Capability parity with reference CVSegmentation._floodfill_level
    (cv.py:19-49, which carries a NameError bug at :36 — fixed by design
    here). Optionally restricted to the seeds' classes. Returns [N] bool.
    """
    adj = jnp.asarray(adj, jnp.int32)
    n = adj.shape[0]
    member = jnp.asarray(seeds, bool)
    adj_ok = adj >= 0
    adj_safe = jnp.where(adj_ok, adj, 0)
    if classes is not None:
        # allow every class that ANY seed carries (the docstring's "the
        # seeds' classes" — keying off only the first seed would strand
        # seeds of a second class as ungrowable singletons)
        classes = jnp.asarray(classes, jnp.int32)
        nclasses_bound = int(jnp.max(classes)) + 1
        seed_hist = jnp.zeros((nclasses_bound,), jnp.int32).at[classes].max(
            member.astype(jnp.int32)
        )
        allowed = seed_hist[classes] > 0
    else:
        allowed = jnp.ones((n,), bool)

    def body(_, member):
        frontier = jnp.any(member[adj_safe] & adj_ok, axis=-1)
        return member | (frontier & allowed)

    member = jax.lax.fori_loop(0, max_level, body, member)
    return np.asarray(member)


def cluster_boundaries(ids: np.ndarray, adj: np.ndarray) -> np.ndarray:
    """Boundary mask: points adjacent to a different instance id.

    The cluster-boundary tracking of reference CVSegmentation
    (_floodfill_class, cv.py:52-89) as one vectorized gather/compare.
    """
    ids = np.asarray(ids)
    adj = np.asarray(adj)
    ok = adj >= 0
    neigh = ids[np.where(ok, adj, 0)]
    return np.any(ok & (neigh != ids[:, None]), axis=-1)


def merge_instances_by_classes(
    ids: np.ndarray, info: List[Dict], classes_to_merge: Sequence[int]
) -> Tuple[np.ndarray, List[Dict]]:
    """Collapse all instances of each listed class into one instance.

    Capability parity with reference CVSegmentation.merge_instances_by_classes
    (cv.py:256-307): the lowest instance id of the class becomes the target;
    areas accumulate; absorbed info entries are removed.
    """
    ids = np.asarray(ids).copy()
    by_class: Dict[int, List[Dict]] = {}
    for entry in info:
        by_class.setdefault(int(entry["category_id"]), []).append(entry)
    absorbed = set()
    for cls_ in classes_to_merge:
        group = sorted(by_class.get(int(cls_), []), key=lambda e: e["id"])
        if len(group) < 2:
            continue
        target = group[0]
        for entry in group[1:]:
            ids[ids == entry["id"]] = target["id"]
            target["area"] = int(target["area"]) + int(entry["area"])
            absorbed.add(entry["id"])
    new_info = [e for e in info if e["id"] not in absorbed]
    return ids, new_info


def instance_separate(
    classes: np.ndarray,
    adj,
    nclasses: int = 133,
    instance_classes: Optional[Sequence[int]] = None,
    minimum_points: int = 1,
):
    """split_into_instances + per-cluster point lists and boundary masks.

    Capability parity with reference CVSegmentation.instance_seperate
    (cv.py:309-365), which exists to expose cluster points/boundaries the
    plain split doesn't return (cv.py docstring :405-408).

    Returns (unique ids, ids, info, classes, clusters dict id->point idx,
    boundary mask [N]).
    """
    uids, ids, info, out_classes = split_into_instances(
        classes, adj, nclasses, instance_classes, minimum_points
    )
    order = np.argsort(ids, kind="stable")
    uniq, counts = np.unique(ids, return_counts=True)
    groups = np.split(order, np.cumsum(counts)[:-1])
    clusters = {int(u): g for u, g in zip(uniq, groups)}
    boundary = cluster_boundaries(ids, np.asarray(adj))
    return uids, ids, info, out_classes, clusters, boundary


def color_segment(
    ids: np.ndarray, num_instances: Optional[int] = None, seed: int = 0
) -> np.ndarray:
    """Seeded per-instance recolor (reference CVSegmentation.color_segment,
    cv.py:367-399). Returns [N, 3] float colors in [0,1]."""
    from fusion3dseg_tpu.utils import palette as pal

    ids = np.asarray(ids)
    k = int(num_instances if num_instances is not None else ids.max() + 1)
    palette = pal.random_palette(max(k, 1), seed=seed)
    return palette[np.clip(ids, 0, k - 1)]
