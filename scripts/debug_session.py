"""Scratch debug script (batched to amortize slow backend init)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import jax, jax.numpy as jnp

print("=== 1. TIR debug ===", flush=True)
from test_materials import _scatter_batch
from tracer.scene import types as T
_, _, d, att, ok = _scatter_batch(T.DIELECTRIC, ir=1.5, front=False,
                                  ray_dir=(0.9, 0.0, -0.436), normal=(0, 0, 1), n=16)
d = np.asarray(d)
print("dirs:", d[:4])
print("ok:", np.asarray(ok)[:4], "att:", np.asarray(att)[:2])
ud = np.array([0.9, 0.0, -0.436]); ud /= np.linalg.norm(ud)
print("want:", ud - 2 * ud[2] * np.array([0, 0, 1.0]), flush=True)

print("=== 2. BVH vs brute force ===", flush=True)
from tracer.scene import builders, config
from tracer.bvh import traverse as bt
from tracer.render import hit as hm
import io as _io

params = config.read_scene_params(_io.StringIO(config.smoke_config_text()))
scene = builders.create_scene(params, with_bvh=True, texture_loader=lambda _: None)
print("scene:", scene.num_spheres, "spheres,", scene.num_planes, "planes,",
      scene.bvh.left.shape[0], "bvh nodes", flush=True)

g = np.random.default_rng(0)
o = jnp.asarray(g.normal(size=(256, 3), scale=10).astype(np.float32))
dd = jnp.asarray(g.normal(size=(256, 3)).astype(np.float32))
t0 = time.perf_counter()
rec_b = hm.hit_scene_brute(scene, o, dd)
rec_v = bt.hit_scene_bvh(scene, o, dd)
print("intersect time", time.perf_counter() - t0, flush=True)
hb, hv = np.asarray(rec_b.hit), np.asarray(rec_v.hit)
tb, tv = np.asarray(rec_b.t), np.asarray(rec_v.t)
print("hit agreement:", (hb == hv).mean())
agree = hb & hv
print("t allclose:", np.allclose(tb[agree], tv[agree], rtol=1e-5))
if not (hb == hv).all():
    idx = np.where(hb != hv)[0][:5]
    print("mismatch rays:", idx, "brute hit:", hb[idx], "t:", tb[idx], "bvh hit:", hv[idx], "t:", tv[idx])
mm = np.asarray(rec_b.material_idx) == np.asarray(rec_v.material_idx)
print("mat idx agreement (on hits):", mm[agree].mean(), flush=True)

print("=== 3. full-scene render via both paths ===", flush=True)
from tracer.render import camera as C, renderer
cam = C.build_camera_data([15 * np.cos(3.14159), 15 * np.sin(3.14159), 4.5],
                          [0, 4.5, 0], 64, 40, 90.0)
t0 = time.perf_counter()
fb1 = renderer.render_frame(scene, cam, 64, 40, spp=2, max_depth=5, chunk=2560)
fb1.block_until_ready(); print("brute render", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
fb2 = renderer.render_frame(scene, cam, 64, 40, spp=2, max_depth=5, use_bvh=True, chunk=2560)
fb2.block_until_ready(); print("bvh render", time.perf_counter() - t0, flush=True)
f1, f2 = np.asarray(fb1), np.asarray(fb2)
diff = np.abs(f1 - f2).max(axis=-1)
print("render agreement: mean abs", np.abs(f1 - f2).mean(), "frac close", (diff < 1e-3).mean())
print("image mean/max:", f1.mean(), f1.max(), flush=True)

print("=== 4. gradient smoke ===", flush=True)
def loss(centers):
    sc = scene._replace(spheres=scene.spheres._replace(center=centers))
    fb = renderer.render_frame(sc, cam, 16, 12, spp=1, max_depth=3, chunk=192)
    return jnp.sum(fb)
t0 = time.perf_counter()
gr = jax.grad(loss)(scene.spheres.center)
gr.block_until_ready()
print("grad time", time.perf_counter() - t0)
gr = np.asarray(gr)
print("grad finite:", np.isfinite(gr).all(), "nonzero:", (np.abs(gr) > 0).sum(), "/", gr.size, flush=True)
print("DONE")
