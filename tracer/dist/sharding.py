"""Multi-device / multi-host rendering: pixel tiles sharded over a Mesh.

The reference is strictly single-GPU (SURVEY.md §2: data-parallel over
pixels within one kernel launch, no inter-device code). The TPU-native
scaling design (SURVEY.md §5, §7 stage 7):

- 1D device mesh with axis 'tiles'; the flat pixel axis is sharded
  across it (`P('tiles')`), scene + camera pytrees are replicated.
- Forward rendering needs ZERO communication: every device shades its
  own pixels against the replicated scene (the tiny ~KB scene rides
  free in HBM everywhere).
- Backward: the transpose of replicated-scene broadcast is a `psum` of
  per-device scene gradients over ICI — inserted automatically when
  differentiating through `shard_map`.
- Multi-host: the same code runs under `jax.distributed.initialize()`;
  the mesh spans all hosts' devices and XLA routes the gradient psum
  over ICI within a slice / DCN across hosts.

Tested on a virtual 8-device CPU mesh (tests/conftest.py) per the
multi-host test strategy in SURVEY.md §4.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tracer.render import camera as camera_mod
from tracer.render import renderer
from tracer.scene.types import Scene

AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "intersector", "reference_quirk", "chunk", "mesh", "rng_mode", "stratify", "rr_start"),
)
def render_frame_sharded(
    scene: Scene,
    cam: camera_mod.CameraData,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    intersector: str = "fast",
    reference_quirk: bool = True,
    chunk: int = renderer.DEFAULT_CHUNK,
    rng_mode: str = "fixed",
    stratify: bool = False,
    rr_start=None,
):
    """Sharded frame render; returns [height, width, 3] raw sample sums.

    Bit-identical to the single-device renderer.render_frame — sharding
    only partitions the pixel axis; seeds are per-pixel so the split
    point is invisible to the result.
    """
    n_dev = mesh.devices.size
    i_flat, j_flat, base_seed = renderer.pixel_grid(width, height, reference_quirk)
    n = i_flat.shape[0]
    pad = (-n) % n_dev
    if pad:
        i_flat = jnp.pad(i_flat, (0, pad))
        j_flat = jnp.pad(j_flat, (0, pad))
        base_seed = jnp.pad(base_seed, (0, pad))
    local_chunk = min(chunk, (n + pad) // n_dev)

    def shard_body(scene, cam, i, j, base):
        # Mark the replicated scene/camera as device-varying: keeps the
        # scan-carry vma types consistent inside the shard, and makes the
        # transpose of this broadcast a psum of per-device scene grads —
        # the cross-device gradient all-reduce, inserted by autodiff.
        def to_varying(x):
            if not hasattr(x, "dtype"):
                return x
            try:
                return jax.lax.pcast(x, (AXIS,), to="varying")
            except AttributeError:  # older jax spells it pvary
                return jax.lax.pvary(x, AXIS)

        scene, cam = jax.tree.map(to_varying, (scene, cam))
        return renderer.render_pixels(
            scene, cam, i, j, base, spp, max_depth,
            intersector=intersector, chunk=local_chunk,
            rng_mode=rng_mode, stratify=stratify, rr_start=rr_start,
        )

    fb = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
    )(scene, cam, i_flat, j_flat, base_seed)
    return fb[:n].reshape(height, width, 3)


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "intersector", "reference_quirk", "chunk", "mesh", "rng_mode", "stratify", "rr_start"),
)
def render_frame_spp_sharded(
    scene: Scene,
    cam: camera_mod.CameraData,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    intersector: str = "fast",
    reference_quirk: bool = True,
    chunk: int = renderer.DEFAULT_CHUNK,
    rng_mode: str = "fixed",
    stratify: bool = False,
    rr_start=None,
):
    """Sample-axis sharding (SURVEY.md §2 parallelism table): every device
    renders ALL pixels with a disjoint slice of the per-pixel sample
    stream, and the raw sums psum over the mesh. Useful when the image is
    too small to fill the mesh with pixels. Requires spp % n_devices == 0.
    Bit-identical to the single-device renderer (sample sums are an
    order-free reduction... up to f32 addition order)."""
    n_dev = mesh.devices.size
    assert spp % n_dev == 0, f"spp {spp} must divide across {n_dev} devices"
    local_spp = spp // n_dev
    strat_sqrt = int(round(spp ** 0.5)) if stratify else 0
    if stratify:
        assert strat_sqrt * strat_sqrt == spp, "stratify requires square spp"
    i_flat, j_flat, base_seed = renderer.pixel_grid(width, height, reference_quirk)

    def shard_body(scene, cam, i, j, base):
        def to_varying(x):
            if not hasattr(x, "dtype"):
                return x
            try:
                return jax.lax.pcast(x, (AXIS,), to="varying")
            except AttributeError:
                return jax.lax.pvary(x, AXIS)

        scene, cam, i, j, base = jax.tree.map(to_varying, (scene, cam, i, j, base))
        start = jax.lax.axis_index(AXIS) * local_spp
        part = renderer.render_pixels(
            scene, cam, i, j, base, local_spp, max_depth,
            intersector=intersector, chunk=min(chunk, i.shape[0]),
            sample_start=start, rng_mode=rng_mode, stratify=stratify,
            strat_sqrt_spp=strat_sqrt, rr_start=rr_start,
        )
        return jax.lax.psum(part, AXIS)

    fb = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
    )(scene, cam, i_flat, j_flat, base_seed)
    return fb.reshape(height, width, 3)


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "mesh",
                     "reference_quirk", "interpret", "tile_px", "stratify",
                     "fast_math", "persistent", "rr_start"),
)
def render_frame_pallas_sharded(
    scene: Scene,
    cam: camera_mod.CameraData,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    reference_quirk: bool = True,
    interpret: bool = False,
    tile_px: int = 1024,
    stratify: bool = False,
    fast_math: bool = False,
    persistent: bool = True,
    rr_start=None,
    sample_start=0,
):
    """Fused Pallas megakernel under shard_map: each device renders a
    contiguous band of image rows with its own pallas_call (round-2
    VERDICT item 5 — the fast engine composes with the mesh).

    The kernel receives the band's global row offset (params slot 15),
    so seeds and camera math are in global pixel coordinates and the
    result is BIT-identical to the single-device megakernel. Forward
    needs zero communication; differentiating through this shard_map
    psums scene gradients exactly like render_frame_sharded.
    """
    from tracer.pallas import megakernel

    n_dev = mesh.devices.size
    rows = -(-height // n_dev)  # ceil: bands below the image are sliced off

    def shard_body(scene, cam, ss):
        def to_varying(x):
            if not hasattr(x, "dtype"):
                return x
            try:
                return jax.lax.pcast(x, (AXIS,), to="varying")
            except AttributeError:
                return jax.lax.pvary(x, AXIS)

        scene, cam, ss = jax.tree.map(to_varying, (scene, cam, ss))
        row0 = jax.lax.axis_index(AXIS) * rows
        return megakernel._render_frame_impl(
            scene, cam, width, rows, spp, max_depth, reference_quirk,
            interpret, 0, tile_px, stratify, None,
            fast_math=fast_math, persistent=persistent, row_offset=row0,
            rr_start=rr_start, sample_start=ss,
        )

    fb = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(AXIS),
        # pallas_call's out_shape carries no vma annotation; the body is
        # trivially device-varying (row0), so skip the vma check
        check_vma=False,
    )(scene, cam, jnp.int32(sample_start))
    return fb[:height]


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "mesh",
                     "reference_quirk", "interpret"),
)
def scene_grads_replay_sharded(
    scene: Scene,
    cam: camera_mod.CameraData,
    target,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    reference_quirk: bool = True,
    interpret: bool = False,
):
    """L2-loss + full scene gradients via the FAST backward, sharded.

    Two sharded passes (round 2): every device (1) renders its row band
    with the RECORDING megakernel — fb plus the winner-index tape — and
    (2) differentiates the tape REPLAY of its band; the shard_map
    transpose psums the per-device scene cotangents exactly like
    scene_grads_sharded, but the backward never runs the O(prims)
    intersection search. Returns (loss, grads).
    """
    import jax.numpy as jnp

    from tracer.core import rng as rng_mod
    from tracer.pallas import megakernel, replay

    n_dev = mesh.devices.size
    rows = -(-height // n_dev)
    hpad = rows * n_dev
    tpad = jnp.zeros((hpad, width, 3), jnp.float32).at[:height].set(
        jnp.asarray(target, jnp.float32)
    )

    def to_varying(x):
        if not hasattr(x, "dtype"):
            return x
        try:
            return jax.lax.pcast(x, (AXIS,), to="varying")
        except AttributeError:
            return jax.lax.pvary(x, AXIS)

    def band_pixels(row0):
        lin = jnp.arange(rows * width, dtype=jnp.uint32)
        i = lin % jnp.uint32(width)
        j = lin // jnp.uint32(width) + row0.astype(jnp.uint32)
        base = rng_mod.pixel_seed(i, j, width, reference_quirk=reference_quirk)
        return i, j, base

    def rec_body(scene, cam):
        scene, cam = jax.tree.map(to_varying, (scene, cam))
        row0 = jax.lax.axis_index(AXIS) * rows
        return megakernel._render_frame_impl(
            scene, cam, width, rows, spp, max_depth, reference_quirk,
            interpret, 0, 128, False, None, persistent=False,
            record_idx=True, row_offset=row0,
        )

    has_tex = scene.textures is not None
    rec_out_specs = (P(AXIS), P(None, None, AXIS))
    if has_tex:  # textured records also emit the texture-multiplier tape
        rec_out_specs = rec_out_specs + (P(None, None, AXIS, None),)
    rec_out = jax.shard_map(
        rec_body, mesh=mesh, in_specs=(P(), P()),
        out_specs=rec_out_specs,
        check_vma=False,
    )(scene, cam)
    if has_tex:
        fb, idx, tex = rec_out
    else:
        fb, idx = rec_out
        tex = None

    def loss_fn(scene):
        def band_loss(scene, cam, idx, tgt, *tex_arg):
            # idx/tgt arrive sharded (already device-varying); only the
            # replicated scene/camera need the varying cast
            scene, cam = jax.tree.map(to_varying, (scene, cam))
            row0 = jax.lax.axis_index(AXIS) * rows
            i, j, base = band_pixels(row0)
            fbr = replay.render_pixels_replay(
                scene, cam, i, j, base, idx, spp, max_depth,
                chunk=min(renderer.DEFAULT_CHUNK, rows * width),
                tex_tape=tex_arg[0] if tex_arg else None,
            ).reshape(rows, width, 3)
            valid = ((row0 + jnp.arange(rows)) < height).astype(jnp.float32)
            d = (fbr / spp - tgt) * valid[:, None, None]
            return jax.lax.psum(jnp.sum(d * d), AXIS)

        in_specs = (P(), P(), P(None, None, AXIS), P(AXIS))
        args = (scene, cam, idx, tpad)
        if has_tex:
            in_specs = in_specs + (P(None, None, AXIS, None),)
            args = args + (tex,)
        l = jax.shard_map(
            band_loss, mesh=mesh,
            in_specs=in_specs,
            out_specs=P(),
        )(*args)
        return l / (height * width * 3)

    loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(scene)
    return loss, grads


@partial(
    jax.jit,
    static_argnames=("width", "height", "rows", "spp_chunk", "max_depth",
                     "mesh", "reference_quirk", "rr_start", "interpret",
                     "fast_math", "texture_grads"),
)
def _chunk_cotangents_sharded(scene, cam, tableT, camv, g_pad, sample_start,
                              width, height, rows, spp_chunk, max_depth,
                              mesh, reference_quirk, rr_start, interpret,
                              fast_math=False, texture_grads=False):
    """One spp chunk of the sharded kernel backward: every device records
    its row band's tape and runs the fused backward kernel on it; the two
    cotangent blocks (combined table + camera rows) psum over the mesh.
    The tape never leaves its device."""
    from tracer.pallas import bwd as bwd_mod
    from tracer.pallas import megakernel

    has_tex = scene.textures is not None
    texture_grads = texture_grads and has_tex
    tape_fields = (13 if texture_grads else 9) if has_tex else 3
    tex_shape = tuple(scene.textures.shape[1:3]) if texture_grads else None

    def to_varying(x):
        if not hasattr(x, "dtype"):
            return x
        try:
            return jax.lax.pcast(x, (AXIS,), to="varying")
        except AttributeError:
            return jax.lax.pvary(x, AXIS)

    def body(scene, cam, tableT, camv, g_band, ss):
        scene, cam, tableT, camv, ss = jax.tree.map(
            to_varying, (scene, cam, tableT, camv, ss))
        row0 = jax.lax.axis_index(AXIS) * rows
        out = megakernel._render_frame_impl(
            scene, cam, width, rows, spp_chunk, max_depth, reference_quirk,
            interpret, 0, 128, False, None, persistent=True,
            record_idx=True, row_offset=row0, sample_start=ss,
            rr_start=rr_start, fast_math=fast_math,
            tape_fields=tape_fields,
        )
        idx = out[1]
        tex = out[2] if has_tex else None
        cot = bwd_mod.band_cotangents(
            tableT, camv, idx, g_band, width, rows, spp_chunk, max_depth,
            row_offset=row0, sample_start=ss,
            reference_quirk=reference_quirk, rr_start=rr_start,
            tex_tape=tex, interpret=interpret,
            texture_grads=texture_grads, tex_shape=tex_shape,
        )
        res = (jax.lax.psum(cot[0], AXIS), jax.lax.psum(cot[1], AXIS))
        if texture_grads:
            res = res + (jax.lax.psum(cot[3], AXIS),)
        return res

    out_specs = (P(), P(), P()) if texture_grads else (P(), P())
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(AXIS), P()),
        out_specs=out_specs,
        check_vma=False,
    )(scene, cam, tableT, camv, g_pad, sample_start)


def l2_grads_deep_sharded(
    scene: Scene,
    cam: camera_mod.CameraData,
    target,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    spp_chunk: int = 8,
    reference_quirk: bool = True,
    rr_start=None,
    interpret: bool = False,
    fwd_spp_chunk=None,
    fast_math: bool = False,
    texture_grads: bool = False,
):
    """(loss, d(scene), d(cam)) for mean((fb/spp - target)^2), sharded AND
    spp-chunked — the BASELINE config-5 runner (2K spheres, 4K render,
    256 spp, tiles sharded, grads on all scene params): row bands shard
    over the mesh, samples chunk on the host so the tape never exceeds
    spp_chunk x max_depth rows per band, and each chunk runs the fused
    Pallas backward kernel per device with the table/camera cotangents
    psum'd over ICI. Gradients match the unsharded bwd.l2_grads_deep up
    to f32 reduction order (tests/test_dist.py pins it on the 8-device
    CPU mesh)."""
    from tracer.pallas import bwd as bwd_mod

    assert spp % spp_chunk == 0, f"spp {spp} % spp_chunk {spp_chunk} != 0"
    n_dev = mesh.devices.size
    rows = -(-height // n_dev)
    hpad = rows * n_dev

    # Phase 1: the plain forward for the loss. fwd_spp_chunk bounds the
    # duration of a single kernel dispatch — one ~190 s dispatch (4K,
    # 256 spp, 2K prims) crashed the tunneled TPU worker; summed chunk
    # frames are the identical estimator up to f32 addition order.
    if fwd_spp_chunk and fwd_spp_chunk < spp:
        assert spp % fwd_spp_chunk == 0
        fb = None
        for c in range(spp // fwd_spp_chunk):
            part = render_frame_pallas_sharded(
                scene, cam, width, height, fwd_spp_chunk, max_depth, mesh,
                reference_quirk=reference_quirk, interpret=interpret,
                tile_px=128, rr_start=rr_start, fast_math=fast_math,
                sample_start=jnp.int32(c * fwd_spp_chunk),
            )
            fb = part if fb is None else fb + part
    else:
        fb = render_frame_pallas_sharded(
            scene, cam, width, height, spp, max_depth, mesh,
            reference_quirk=reference_quirk, interpret=interpret, tile_px=128,
            rr_start=rr_start, fast_math=fast_math,
        )
    tgt = jnp.asarray(target, jnp.float32)

    def loss_of(fb):
        return jnp.mean((fb / spp - tgt) ** 2)

    loss, loss_vjp = jax.vjp(loss_of, fb)
    (g_fb,) = loss_vjp(jnp.ones((), jnp.float32))
    g_pad = jnp.zeros((hpad, width, 3), jnp.float32).at[:height].set(g_fb)

    (tableT, camv), vjp_tables = jax.vjp(bwd_mod.pack_tables, scene, cam)

    texture_grads = texture_grads and scene.textures is not None
    dtable = dcam = dtex = None
    for c in range(spp // spp_chunk):
        cot = _chunk_cotangents_sharded(
            scene, cam, tableT, camv, g_pad, jnp.int32(c * spp_chunk),
            width, height, rows, spp_chunk, max_depth, mesh,
            reference_quirk, rr_start, interpret, fast_math=fast_math,
            texture_grads=texture_grads,
        )
        if dtable is None:
            dtable, dcam = cot[0], cot[1]
            dtex = cot[2] if texture_grads else None
        else:
            dtable, dcam = dtable + cot[0], dcam + cot[1]
            if texture_grads:
                dtex = dtex + cot[2]
    g_scene, g_cam = vjp_tables((dtable, dcam))
    if texture_grads:
        g_scene = g_scene._replace(textures=g_scene.textures.at[0].add(dtex))
    return loss, g_scene, g_cam


def scene_grads_sharded(
    scene: Scene,
    cam: camera_mod.CameraData,
    target,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    intersector: str = "fast",
):
    """L2-loss gradient of a sharded render w.r.t. the whole scene pytree.

    The per-device partial gradients of the replicated scene are psum'd
    across the mesh by the shard_map transpose — this is the reference's
    missing 'distributed backend' slot (SURVEY.md §2) done the XLA way.
    Returns (loss, grads) with grads a Scene-shaped pytree.
    """

    def loss_fn(scene):
        fb = render_frame_sharded(
            scene, cam, width, height, spp, max_depth, mesh, intersector=intersector
        )
        return jnp.mean((fb / spp - target) ** 2)

    # allow_int: index/type fields of the Scene pytree get float0 tangents.
    return jax.value_and_grad(loss_fn, allow_int=True)(scene)
