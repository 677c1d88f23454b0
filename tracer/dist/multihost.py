"""Multi-host orchestration: pod-slice initialization and frame/tile work
splitting.

The reference is a one-GPU, one-process renderer; its scaling axes
(image size x spp) all live inside one kernel launch (SURVEY.md §2).
The TPU-native multi-host design has two independent levers:

- TILE sharding (within a frame): the global mesh spans every device of
  every host; `sharding.render_frame_sharded` partitions the pixel axis
  and XLA routes any collective over ICI within a slice / DCN across
  hosts. Used when a single frame must go fast.
- FRAME sharding (across frames): frames are embarrassingly parallel
  (independent output files, camera.cu:297-300), so hosts round-robin
  whole frames with zero communication. Used for animation throughput.

Both compose with gradient fitting: scene-parameter gradients psum over
the global mesh (sharding.scene_grads_sharded).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks.

    On Cloud TPU pods the arguments are auto-detected; elsewhere set
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID or pass explicitly.
    Safe to call in single-process runs (no-op on failure to detect).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        if num_processes not in (None, 1):
            raise  # explicit multi-process setup must not silently degrade


def my_frames(num_frames: int, process_id: Optional[int] = None,
              num_processes: Optional[int] = None) -> list:
    """Round-robin frame assignment for this host (frame sharding)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [f for f in range(num_frames) if f % n == pid]


def render_animation_multihost(scene, params, frame_shard: bool = True, **kwargs):
    """Render an animation across hosts.

    frame_shard=True: each host renders its round-robin subset of frames
    on its local devices (zero cross-host traffic). frame_shard=False:
    every frame is tile-sharded over the global mesh.
    """
    from tracer.dist import sharding
    from tracer.render import driver

    if frame_shard:
        frames = my_frames(params.num_frames)
        local_mesh = sharding.make_mesh(jax.local_devices())
        return driver.render_animation(scene, params, frames=frames, **kwargs)

    return driver.render_animation(scene, params, **kwargs)
