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

from fusion3dseg_tpu import config  # noqa: F401


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
