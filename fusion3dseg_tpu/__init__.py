"""fusion3dseg_tpu — TPU-native 3D point-cloud segmentation via 2D image segmentation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
raviraj988/3D-POINT-CLOUD-SEGMENTATION-USING-2D-IMG-SEGMENTATION:

  RGB-D SLAM session -> 2D semantic segmentation -> multi-view point-cloud
  fusion -> 2D->3D label lifting by multi-view voting -> panoptic instance
  split -> oriented-bounding-box post-processing.

The reference is a single-threaded NumPy pipeline (see /root/repo/SURVEY.md);
here every hot path is an array program: batched projection matmuls, scatter
z-buffers, segment reductions for voting/fusion, iterative label propagation
for connected components, and an MXU [K,N]@[N,K] co-membership matmul for
bounding-box merging. Multi-chip scaling uses jax.sharding Mesh + shard_map
with psum vote reduction over ICI.

Stage-artifact contracts (directory layout, dtypes of votes.npy / classes.npy /
ids.npy / info.json / uv2pt/*.npy / fusion_data.pkl) match the reference's
de-facto public API documented in SURVEY.md §1.
"""

__version__ = "0.1.0"

import os as _os

from fusion3dseg_tpu import config  # noqa: F401


def enable_compile_cache():
    """Point JAX's persistent compilation cache at a user-cache dir.

    Compiles of the big session programs (fuse_session, the label-fuse
    scans, model train steps) take minutes through a remote-compile
    tunnel; the persistent cache makes every process after the first
    start warm (measured ~10 min -> 27 s). Called by the framework entry
    points (cli, bench, __graft_entry__) AFTER backend selection — NOT at
    import, because the decision needs the actual backend: XLA:CPU cache
    entries are AOT machine code, and under a remote-compile service the
    compile machine's CPU features can differ from this host's (observed
    a feature-mismatch load warning about potential SIGILL), so CPU runs
    — including config-forced CPU, which no env sniff can see — must skip
    it. Opt out entirely with FUSION3DSEG_NO_COMPILE_CACHE=1.
    """
    if _os.environ.get("FUSION3DSEG_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.path.join(
                _os.path.expanduser("~"), ".cache", "fusion3dseg_tpu", "xla"
            )
            _os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # never let cache plumbing break startup
        pass


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax/cv2 at package import)
    if name in ("Fusion", "fuse_session"):
        from fusion3dseg_tpu import fusion as _f

        return getattr(_f, name)
    if name == "SessionData":
        from fusion3dseg_tpu.io.rtab import SessionData

        return SessionData
    if name in ("process3DSeg", "segment", "remove_classes", "SegmentImage"):
        from fusion3dseg_tpu import pipeline as _p

        return getattr(_p, name)
    raise AttributeError(name)
