"""Data-parallel ORB front-end over a device mesh.

The reference's only intra-frame parallelism is two std::threads for the
stereo pair (src/Frame.cc:89-92). On a TPU slice the natural analog is
BATCH parallelism: shard a batch of frames (multi-camera rig, offline
mapping/relocalization sweeps, map-building replays) across devices with
`shard_map`; each device scans over its local shard with the single-image
extractor (sequential-in-jit — vmap pessimizes the patch gathers, see
ops/frontend.py). No collectives are needed: extraction is embarrassingly
parallel, so scaling is linear over ICI-connected devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from my_orb_slam2_tpu.ops.frontend import OrbExtractor


def make_batch_extractor(mesh: Mesh, extractor: OrbExtractor, axis: str = "batch"):
    """Returns fn: (B, H, W) u8/f32 images -> Keypoints batched over B.

    B must be divisible by the mesh axis size; each device extracts its
    local B/n_devices images with a lax.scan over the single-image kernel.
    """

    def local_fn(imgs):  # (B_local, H, W)
        def body(_, img):
            kp, _atlas = extractor._extract_impl(img)
            return 0, kp

        _, kps = jax.lax.scan(body, 0, imgs.astype(jnp.float32))
        return kps

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
            check_vma=False,
        )
    )

    def run(images):
        sharded = jax.device_put(images, NamedSharding(mesh, P(axis)))
        return fn(sharded)

    return run
