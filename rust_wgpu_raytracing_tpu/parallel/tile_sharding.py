"""Multi-chip scaling: image-tile sharding + sample-parallel rendering.

The reference is single-GPU/single-queue (SURVEY §2.3); its only
parallelism is per-pixel SPMD within one dispatch. The TPU-native
scale-out story:

- **dp (tile parallel)**: shard the image's ROW axis across devices —
  rendering is embarrassingly parallel over pixels, the scene is
  replicated, and the framebuffer comes back sharded (XLA inserts the
  all-gather only if a replicated output is requested);
- **sp (sample parallel)**: shard the anti-aliasing / progressive-
  accumulation sample axis; each device renders jittered sub-pixel
  samples and a `psum` mean over 'sp' rides the ICI;
- gradients for inverse rendering (`train_step`) are `psum`-reduced
  over BOTH axes — the collective pattern of data-parallel training.

Everything here works on an N-virtual-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) exactly as on a
TPU pod slice; tests/test_sharding.py runs it on 8 virtual devices.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import CameraUniforms
from ..core.scene import SceneData
from ..ops.intersect import intersect_sphere, intersect_tris
from ..ops.raygen import ndc_grid
from ..ops.composite import clear, composite_pass
from ..ops.shade import shade_mesh_hit, shade_sphere, quantize_rgba8


def make_render_mesh(n_devices: Optional[int] = None,
                     sp: int = 1) -> Mesh:
    """A (dp, sp) device mesh over the first n devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % sp == 0, (n, sp)
    arr = np.array(devs).reshape(n // sp, sp)
    return Mesh(arr, ("dp", "sp"))


def _render_rows(scene: SceneData, uni_flat, width: int, total_height: int,
                 row0, rows: int, jitter=None, near=0.01, far=100.0,
                 background=(0.0, 0.0, 0.0)):
    """Differentiable row-slab renderer (pure jnp — the oracle math over
    rows [row0, row0+rows) of a total_height-tall image).

    `jitter` (2,) adds a sub-pixel offset in NDC units (sample-parallel
    anti-aliasing); None keeps the reference's pixel centers.
    """
    uni = CameraUniforms.unflat(jnp.asarray(uni_flat, jnp.float32))
    origin = uni.origin

    from ..ops.intersect import HI
    proj_inv = uni.proj_inv_wgpu
    view_inv = uni.view_inv
    m = jnp.matmul(view_inv[:3, :3], proj_inv[:3, :], precision=HI)
    const = m[:, 2] + m[:, 3]

    x_nds = (2.0 * (jnp.arange(width, dtype=jnp.float32) + 0.5) / width) - 1.0
    y_idx = row0 + jnp.arange(rows, dtype=jnp.float32)
    y_nds = (2.0 * (y_idx + 0.5) / total_height) - 1.0
    if jitter is not None:
        x_nds = x_nds + jitter[0]
        y_nds = y_nds + jitter[1]

    d = (m[:, 0][None, None, :] * x_nds[None, :, None]
         + m[:, 1][None, None, :] * y_nds[:, None, None]
         + const[None, None, :])
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    color, depth = clear(rows, width, background)
    for i in range(scene.num_spheres):
        sh = intersect_sphere(scene.sphere_center[i], scene.sphere_radius[i],
                              origin, dirs)
        hit = jnp.isfinite(sh.t)
        safe_n = jnp.where(hit[..., None], sh.normal, 0.0)
        pc = shade_sphere(scene, i, safe_n, dirs)
        color, depth = composite_pass(color, depth, pc, sh.t, hit, near, far)

    if scene.num_faces > 0:
        th = intersect_tris(scene, origin, dirs)
        hit = jnp.isfinite(th.t)
        pc = shade_mesh_hit(scene, th.face, th.u, th.v, th.n_dot_d, dirs)
        pc = jnp.where(hit[..., None], pc, 0.0)
        color, depth = composite_pass(color, depth, pc, th.t, hit, near, far)
    return color, depth


def render_sharded(scene: SceneData, uni_flat, mesh: Mesh, *, width: int,
                   height: int, spp: int = 1, seed: int = 0,
                   quantize: bool = True):
    """Render one frame sharded over the mesh: rows over 'dp', jittered
    sub-pixel samples over 'sp' (mean via psum). Returns a replicated
    (H, W, 3) framebuffer (XLA all-gathers the row shards)."""
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert height % dp == 0
    rows = height // dp

    def shard_fn(scene_rep, uni_rep):
        dpi = jax.lax.axis_index("dp")
        spi = jax.lax.axis_index("sp")
        row0 = (dpi * rows).astype(jnp.float32)

        def sample(s, acc):
            # fold twice: spi*K + s collides across sp ranks once
            # spp exceeds K, duplicating jitter samples
            k = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), spi), s)
            jit_xy = (jax.random.uniform(k, (2,)) - 0.5) * jnp.asarray(
                [2.0 / width, 2.0 / height], jnp.float32)
            jit_xy = jnp.where(spp * sp == 1, jnp.zeros(2), jit_xy)
            c, _ = _render_rows(scene_rep, uni_rep, width, height, row0,
                                rows, jitter=jit_xy)
            return acc + c

        acc = jnp.zeros((rows, width, 3), jnp.float32)
        if spp > 1:
            # mark the carry as device-varying so scan's type check passes
            acc = jax.lax.pcast(acc, ("dp", "sp"), to="varying")
            acc = jax.lax.fori_loop(0, spp, sample, acc)
        else:
            acc = sample(0, acc)
        color = jax.lax.psum(acc, "sp") / (spp * sp)
        return color[None]  # add dp-shardable leading axis

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("dp"),
    )
    tiles = fn(scene, jnp.asarray(uni_flat, jnp.float32))  # (dp, rows, W, 3)
    color = tiles.reshape(height, width, 3)
    if quantize:
        color = quantize_rgba8(color)
    return color


def render_sharded_megakernel(scene: SceneData, uni_flat, mesh: Mesh, *,
                              width: int, height: int, shadows: bool = False,
                              quantize: bool = True,
                              interpret: Optional[bool] = None,
                              fused: Optional[bool] = None):
    """Multi-chip frame on the FAST path: each device runs the full
    Pallas megakernel frame on its row slab (scene replicated, zero
    inter-chip traffic until the framebuffer gather). Returns a
    replicated (H, W, 3) framebuffer. fused selects the frame program
    per RenderConfig.variant semantics (the fused single-kernel frame
    takes the same row0/total_height slab viewport)."""
    import jax as _jax

    from ..ops.megakernel import render_megakernel

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    dp = mesh.shape["dp"]
    assert height % dp == 0
    rows = height // dp

    def shard_fn(scene_rep, uni_rep):
        dpi = jax.lax.axis_index("dp")
        row0 = (dpi * rows).astype(jnp.float32)
        c, _ = render_megakernel(
            scene_rep, uni_rep, width=width, height=rows, shadows=shadows,
            quantize=quantize, interpret=interpret, row0=row0,
            total_height=height, fused=fused)
        return c[None]

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P()), out_specs=P("dp"), check_vma=False)
    tiles = fn(scene, jnp.asarray(uni_flat, jnp.float32))
    return tiles.reshape(height, width, 3)


def render_pathtrace_sharded(scene: SceneData, uni_flat, key, mesh: Mesh, *,
                             width: int, height: int, bounces: int = 4,
                             spp: int = 1, background=(0.0, 0.0, 0.0),
                             interpret: Optional[bool] = None):
    """Multi-chip path tracing: image rows sharded over 'dp', jittered
    path samples over 'sp' (each sp rank traces its own fold of the key;
    the radiance MEAN rides a psum over ICI). The scale-out analogue of
    the reference's per-pixel dispatch (src/lib.rs:1183) applied to the
    path-traced extension. Returns the replicated (H, W, 3) MEAN
    radiance over all sp*spp samples (unlike single-device
    render_pathtrace, which returns the spp SUM — the collective divides
    here because only this function knows the mesh-wide sample count)."""
    import jax as _jax

    from ..ops.pathtrace import render_pathtrace

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert height % dp == 0
    rows = height // dp

    def shard_fn(scene_rep, uni_rep, key_rep):
        dpi = jax.lax.axis_index("dp")
        spi = jax.lax.axis_index("sp")
        row0 = (dpi * rows).astype(jnp.float32)
        # decorrelate jitter/bounce sampling across BOTH mesh axes
        k = jax.random.fold_in(jax.random.fold_in(key_rep[0], spi), dpi)
        color = render_pathtrace(
            scene_rep, uni_rep, k, width=width, height=rows,
            bounces=bounces, spp=spp, background=background,
            interpret=interpret, row0=row0, total_height=height)
        color = jax.lax.psum(color, "sp") / (spp * sp)
        return color[None]

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(), P()), out_specs=P("dp"),
                   check_vma=False)
    tiles = fn(scene, jnp.asarray(uni_flat, jnp.float32), key[None])
    return tiles.reshape(height, width, 3)


# ---------------------------------------------------------------------------
# Inverse rendering: the sharded training step (dp x sp collectives)
# ---------------------------------------------------------------------------


def _apply_params(scene: SceneData, params) -> SceneData:
    """Inject differentiable parameters into the scene pytree."""
    return dataclasses.replace(
        scene,
        sphere_color=params["sphere_color"],
        mat_ambient=params["mat_ambient"],
    )


def make_train_step(scene: SceneData, mesh: Mesh, *, width: int, height: int,
                    lr: float = 0.05):
    """A jitted, sharded inverse-rendering step: render with current
    params, MSE against a target framebuffer, psum gradients over the
    whole mesh, SGD update. Image rows sharded over 'dp', jittered
    samples over 'sp'."""
    dp = mesh.shape["dp"]
    rows = height // dp
    assert height % dp == 0

    def loss_local(params, scene_rep, uni_rep, target_rows, row0, key):
        sc = _apply_params(scene_rep, params)
        jit_xy = (jax.random.uniform(key, (2,)) - 0.5) * jnp.asarray(
            [2.0 / width, 2.0 / height], jnp.float32)
        c, _ = _render_rows(sc, uni_rep, width, height, row0, rows,
                            jitter=jit_xy)
        return jnp.mean((c - target_rows) ** 2)

    def step_shard(params, scene_rep, uni_rep, target_shard, seed):
        dpi = jax.lax.axis_index("dp")
        spi = jax.lax.axis_index("sp")
        row0 = (dpi * rows).astype(jnp.float32)
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed * 977 + spi)
        loss, grads = jax.value_and_grad(loss_local)(
            params, scene_rep, uni_rep, target_shard[0], row0, key)
        # collective ride over ICI: mean loss + grads across the mesh
        loss = jax.lax.pmean(loss, ("dp", "sp"))
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, ("dp", "sp")), grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    sharded = shard_map(
        step_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P()),
        out_specs=(P(), P()),
    )

    @jax.jit
    def train_step(params, scene_rep, uni_flat, target, seed):
        target_tiles = target.reshape(dp, rows, width, 3)
        return sharded(params, scene_rep, jnp.asarray(uni_flat, jnp.float32),
                       target_tiles, seed)

    return train_step


# ---------------------------------------------------------------------------
# Driver dryrun
# ---------------------------------------------------------------------------


def dryrun_multichip(n_devices: int) -> None:
    """Build an n-device mesh, jit the FULL sharded training step (real
    dp/sp shardings + psum/pmean collectives), run one step + one
    sharded render on tiny shapes."""
    from ..config import (MeshConfig, RenderConfig, SceneConfig,
                          SphereConfig, CameraConfig)
    from ..core.camera import Camera
    from ..core.scene import Scene

    sp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_render_mesh(n_devices, sp=sp)
    dp = mesh.shape["dp"]

    W = 64
    # rows per device must divide evenly: dp*4 < 16 only pads UP in
    # dp-sized steps (H = 16 with dp = 3 fails the height % dp assert)
    H = dp * max(4, -(-16 // dp))
    cfg = SceneConfig(
        spheres=(SphereConfig(center=(0.5, 0.2, -3.0), radius=0.6),),
        meshes=(MeshConfig(obj_path="builtin:cube", translation=(-0.6, 0.0, -3.0),
                           scale=0.8),),
        camera=CameraConfig(),
        render=RenderConfig(width=W, height=H),
    )
    scene = Scene.build(cfg)
    cam = Camera.from_config(cfg.camera, aspect=W / H)
    uni = cam.uniforms().flat()

    # sharded forward frame (oracle path)
    color = render_sharded(scene.data, uni, mesh, width=W, height=H, spp=1)
    assert color.shape == (H, W, 3)

    # sharded forward frame (Pallas megakernel path, both frame programs)
    color_mk = render_sharded_megakernel(scene.data, uni, mesh,
                                         width=W, height=H)
    assert color_mk.shape == (H, W, 3)
    color_fu = render_sharded_megakernel(scene.data, uni, mesh,
                                         width=W, height=H, fused=True)
    assert color_fu.shape == (H, W, 3)

    # sharded path-tracing step (dp rows x sp samples, psum'd radiance)
    color_pt = render_pathtrace_sharded(
        scene.data, uni, jax.random.PRNGKey(0), mesh,
        width=W, height=H, bounces=1, spp=1)
    jax.block_until_ready(color_pt)
    assert color_pt.shape == (H, W, 3)
    assert bool(jnp.all(jnp.isfinite(color_pt)))

    # geometry-parallel frames (face soup sharded over 'gp', pmin/psum
    # winner merge — parallel/geometry_sharding.py): lit, shadowed,
    # and the gp path tracer
    from .geometry_sharding import (make_gp_mesh, render_pathtrace_gp,
                                    render_sharded_gp)
    gp_mesh = make_gp_mesh(n_devices)
    color_gp, depth_gp = render_sharded_gp(
        scene.data, uni, gp_mesh, width=W, height=H)
    jax.block_until_ready(color_gp)
    assert color_gp.shape == (H, W, 3)
    assert depth_gp.shape == (H, W)
    color_gps, _ = render_sharded_gp(
        scene.data, uni, gp_mesh, width=W, height=H, shadows=True)
    jax.block_until_ready(color_gps)
    assert color_gps.shape == (H, W, 3)
    color_gpt = render_pathtrace_gp(
        scene.data, uni, jax.random.PRNGKey(0), gp_mesh,
        width=W, height=H, bounces=1, spp=1)
    jax.block_until_ready(color_gpt)
    assert color_gpt.shape == (H, W, 3)
    assert bool(jnp.all(jnp.isfinite(color_gpt)))

    # 2-D ('dp', 'gp') composition: row slabs x face shards
    if n_devices >= 4 and n_devices % 2 == 0 and H % 2 == 0:
        color_2d, _ = render_sharded_gp(
            scene.data, uni, make_gp_mesh(n_devices, dp=2),
            width=W, height=H)
        jax.block_until_ready(color_2d)
        assert color_2d.shape == (H, W, 3)

    # full training step: differentiable render + psum'd grads + update
    params = {
        "sphere_color": scene.data.sphere_color,
        "mat_ambient": scene.data.mat_ambient,
    }
    target = jnp.asarray(color)  # self-target: step should be ~no-op-ish
    step = make_train_step(scene.data, mesh, width=W, height=H)
    new_params, loss = step(params, scene.data, uni, target, 0)
    jax.block_until_ready(loss)
    assert jnp.isfinite(loss)
    for k in params:
        assert new_params[k].shape == params[k].shape
