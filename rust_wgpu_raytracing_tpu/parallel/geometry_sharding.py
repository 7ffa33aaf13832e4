"""Geometry-parallel (gp) rendering: the scene's FACE axis sharded
across the device mesh — the tensor-parallel analogue for a ray
tracer, where the scene (not a weight matrix) is what outgrows one
chip.

The reference is strictly single-GPU (one wgpu device owns every
storage buffer, /root/reference/src/lib.rs:1012-1230); this module is
TPU scale-out the scaling-book way: pick a mesh axis, shard the big
operand over it, let the collectives ride ICI.

How it stays BIT-IDENTICAL to the single-chip frame: faces are
concatenated in pass order, and the frame's compositing rule is a
lexicographic min over (nonlinear depth, face index) — strict-<
against the running buffer (earlier face wins ties,
triangle_list/compute.wgsl:198). Shards slice the face soup in
ascending superblock order, so the global face order IS
(chip, local face) lexicographic. Each chip renders its sub-scene
with the UNCHANGED megakernel frame (spheres replicated — every chip
resolves sphere-vs-local-mesh with the exact single-chip rule, and
identical sphere pixels merge to themselves), then three collectives
reproduce the global rule exactly:

    dmin  = pmin(depth)                      over 'gp'
    wchip = pmin(where(depth == dmin, gp_index, n))   # tie -> lowest
    color = psum(where(win, color, 0))       # exactly one winner/pixel

The psum is bitwise-exact: exactly one chip contributes a nonzero
summand per pixel (depth ties across chips resolve to the lowest chip,
matching "earliest face in the global order wins ties"; a per-face
depth is computed on exactly one chip, so cross-chip float drift
cannot exist). Misses carry depth 1.0 on every chip, so background
pixels pick chip 0's background — the same RGB everywhere.

Per-chip work drops ~linearly in the shard's face count (every chip
still traces all rays — this axis buys scene SIZE and sweep time, not
ray throughput; compose with 'dp' row slabs for both).

SHADOWS are a second collective stage: occlusion of the MERGED winner
wavefront is a boolean union over the face soup, so each chip builds
its local frame up to the shadow wavefront
(render_megakernel(..., emit_shadow_planes=True)), the winner planes
merge with the same (depth, chip) rule, every chip traces the SAME
merged wavefront against ITS OWN faces, and one more collective ORs
the occlusion bits — then the ambient substitution and present are
replicated scalar work. Still bit-identical: the single-chip any-hit
is "any face occludes", and a union over disjoint face shards tests
exactly the same set of faces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.scene import GPACK_ROWS, STREAM_COLS, SUPER_F, SceneData

# every per-FACE-leading-axis field of SceneData (sliced over 'gp');
# blk/spack/gpack have their own layouts and are handled explicitly
FACE_FIELDS = ("tri_p0", "tri_n", "tri_d", "tri_g", "tri_c",
               "tri_inv_denom", "tri_uv", "tri_vn", "tri_mat",
               "tri_valid", "tri_orig", "tri_tangent", "tri_bitangent",
               "tri_uvscale")


def _pad_axis(x, n, axis=0, fill=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths,
                   constant_values=np.asarray(fill, x.dtype)[()])


def shard_scene_faces(sd: SceneData, n: int) -> Tuple[dict, SceneData]:
    """Split the face soup into n equal superblock-aligned shards.

    Returns (stacked, rest): `stacked` maps field name -> array with a
    leading (n,) shard axis (feed through shard_map with P('gp')),
    `rest` is the SceneData with face-axis fields emptied (replicate
    with P()). Shards are sliced at SUPER_F boundaries so every kernel
    invariant holds per shard (f % 1024 == 0 covers FACE_PAD, the
    cull-cluster granularity, and whole streaming superblocks); the
    tail shard is padded with the scene's own padding conventions
    (zero face rows -> |N.d| < eps rejects; +inf/-inf cluster AABBs ->
    the slab test culls; tri_valid 0)."""
    f = sd.padded_faces
    assert f > 0, "geometry sharding needs a mesh"
    per = max(SUPER_F, -(-f // (n * SUPER_F)) * SUPER_F)
    tot = per * n

    stacked = {}
    for name in FACE_FIELDS:
        x = getattr(sd, name)
        stacked[name] = _pad_axis(x, tot).reshape((n, per) + x.shape[1:])

    nblk = sd.blk_lo.shape[0]
    g = f // nblk  # faces per cull cluster (8 small / 32 streaming)
    assert per % g == 0, (per, g)
    stacked["blk_lo"] = _pad_axis(sd.blk_lo, tot // g,
                                  fill=jnp.inf).reshape(n, per // g, 3)
    stacked["blk_hi"] = _pad_axis(sd.blk_hi, tot // g,
                                  fill=-jnp.inf).reshape(n, per // g, 3)

    if sd.spack is not None and sd.spack.shape[0]:
        stacked["spack"] = _pad_axis(sd.spack, tot).reshape(
            n, per, STREAM_COLS)
    else:
        stacked["spack"] = jnp.zeros((n, 0, STREAM_COLS), jnp.float32)
    gp = _pad_axis(sd.gpack, tot, axis=1)  # (GPACK_ROWS, tot)
    stacked["gpack"] = jnp.moveaxis(
        gp.reshape(GPACK_ROWS, n, per), 1, 0)

    empties = {name: getattr(sd, name)[:0] for name in FACE_FIELDS}
    empties["blk_lo"] = sd.blk_lo[:0]
    empties["blk_hi"] = sd.blk_hi[:0]
    empties["spack"] = sd.spack[:0] if sd.spack is not None else None
    empties["gpack"] = sd.gpack[:, :0] if sd.gpack is not None else None
    rest = dataclasses.replace(
        sd, num_faces=per, bvh_nodes=0,
        bvh_pack=jnp.zeros((9, 1), jnp.float32), **empties)
    return stacked, rest


def make_gp_mesh(n_devices: Optional[int] = None, dp: int = 1,
                 sp: int = 1) -> Mesh:
    """('gp',), ('dp', 'gp'), ('sp', 'gp') or ('dp', 'sp', 'gp') mesh —
    image rows x path samples x face shards. The gp winner-merge
    collectives ride within a (dp, sp) row; the sp radiance mean is one
    more psum; the dp axis needs no collectives at all (each row slab
    is independent)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % (dp * sp) == 0, (n, dp, sp)
    gp = n // (dp * sp)
    shape, names = [], []
    for size, name in ((dp, "dp"), (sp, "sp")):
        if size > 1:
            shape.append(size)
            names.append(name)
    shape.append(gp)
    names.append("gp")
    return Mesh(np.array(devs[:n]).reshape(shape), tuple(names))


def _dp_slab(mesh: Mesh, height: int):
    """(rows, row0_fn, out_spec) for an optional 'dp' row-slab axis."""
    dp = mesh.shape.get("dp", 1)
    assert height % dp == 0, (height, dp)
    rows = height // dp
    if dp == 1:
        return rows, (lambda: None), P()
    return rows, (lambda: (jax.lax.axis_index("dp") * rows)
                  .astype(jnp.float32)), P("dp")


def render_sharded_gp(scene: SceneData, uni_flat, mesh: Mesh, *,
                      width: int, height: int, shadows: bool = False,
                      quantize: bool = True, accel: str = "cull",
                      background=(0.0, 0.0, 0.0),
                      normal_mapping: bool = False, mip: bool = False,
                      near: float = 0.01, far: float = 100.0,
                      interpret: Optional[bool] = None):
    """One frame with the face soup sharded over the mesh's 'gp' axis.
    Returns replicated (color (H, W, 3), depth (H, W)) — bit-identical
    to single-chip render_megakernel (see module docstring; tested on
    the 8-virtual-device CPU mesh). normal_mapping/mip forward to the
    per-shard frame (texture pools are replicated; tri_tangent /
    tri_uvscale ride the face shards)."""
    import jax as _jax

    from ..ops.megakernel import (BLOCK_F, _frame_shape, _should_stream,
                                  _spheres_occlude_planar,
                                  anyhit_pallas, anyhit_reordered_pallas,
                                  present_planar, render_megakernel)

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    n = mesh.shape["gp"]
    dp = mesh.shape.get("dp", 1)
    rows, row0_fn, dp_spec = _dp_slab(mesh, height)
    stacked, rest = shard_scene_faces(scene, n)

    def _merge(depth, planes):
        """(depth, chip)-lexicographic winner select of every plane.
        Exactly one chip wins a pixel, so the psum over the masked
        planes is bitwise the winner's value."""
        gpi = jax.lax.axis_index("gp")
        dmin = jax.lax.pmin(depth, "gp")
        wchip = jax.lax.pmin(
            jnp.where(depth == dmin, gpi, n).astype(jnp.int32), "gp")
        win = (depth == dmin) & (gpi == wchip)
        out = []
        for p in planes:
            w = win.reshape(win.shape + (1,) * (p.ndim - win.ndim))
            if p.dtype == jnp.bool_:
                out.append(jax.lax.psum(
                    jnp.where(w, p, False).astype(jnp.int32), "gp") > 0)
            else:
                out.append(jax.lax.psum(
                    jnp.where(w, p, jnp.zeros((), p.dtype)), "gp"))
        return dmin, out

    def shard_fn(face_loc, rest_rep, uni_rep):
        local = dataclasses.replace(
            rest_rep, **{k: v[0] for k, v in face_loc.items()})
        row0 = row0_fn()
        th = height if dp > 1 else None
        common = dict(width=width, height=rows, quantize=quantize,
                      accel=accel, background=background,
                      normal_mapping=normal_mapping, mip=mip,
                      near=near, far=far,
                      interpret=interpret, row0=row0, total_height=th)
        if not shadows:
            color, depth = render_megakernel(local, uni_rep,
                                             shadows=False, **common)
            dmin, (color,) = _merge(depth, [color])
            return ((color[None], dmin[None]) if dp > 1
                    else (color, dmin))
        pl_ = render_megakernel(local, uni_rep, shadows=True,
                                emit_shadow_planes=True, **common)
        names = ("cr", "cg", "cb", "w_ar", "w_ag", "w_ab", "covered",
                 "relevant", "px", "py", "pz", "sdx", "sdy", "sdz")
        dmin, merged = _merge(pl_["depth"], [pl_[k] for k in names])
        m = dict(zip(names, merged))
        # stage 2: every chip traces the SAME merged wavefront against
        # its own faces; occlusion is the OR over shards (+ replicated
        # spheres — identical on every chip)
        ah = (anyhit_reordered_pallas
              if _should_stream(local.padded_faces, BLOCK_F)
              else anyhit_pallas)
        occ_l = ah(local, m["px"], m["py"], m["pz"],
                   m["sdx"], m["sdy"], m["sdz"], m["relevant"],
                   interpret=interpret, accel=accel)
        occ = jax.lax.psum(occ_l.astype(jnp.int32), "gp") > 0
        occ = occ | _spheres_occlude_planar(
            local, m["px"], m["py"], m["pz"],
            m["sdx"], m["sdy"], m["sdz"])
        shadowed = m["covered"] & occ
        cr = jnp.where(shadowed, m["w_ar"], m["cr"])
        cg = jnp.where(shadowed, m["w_ag"], m["cg"])
        cb = jnp.where(shadowed, m["w_ab"], m["cb"])
        color, depth = present_planar(
            cr, cg, cb, dmin, width=width, height=rows,
            shape=_frame_shape(width, rows, row0, th),
            quantize=quantize)
        return ((color[None], depth[None]) if dp > 1
                else (color, depth))

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("gp"), stacked),
                  jax.tree.map(lambda _: P(), rest), P()),
        out_specs=(dp_spec, dp_spec), check_vma=False)
    color, depth = fn(stacked, rest, jnp.asarray(uni_flat, jnp.float32))
    if dp > 1:
        color = color.reshape(height, width, 3)
        depth = depth.reshape(height, width)
    return color, depth


def render_pathtrace_gp(scene: SceneData, uni_flat, key, mesh: Mesh, *,
                        width: int, height: int, bounces: int = 4,
                        spp: int = 1, background=(0.0, 0.0, 0.0),
                        interpret: Optional[bool] = None):
    """Path tracing with the face soup sharded over 'gp': the whole
    per-ray state machine (jitter, NEE, roulette-free bounces, RNG)
    runs REPLICATED on every chip, and only the three mesh-intersection
    passes are sharded — each chip sweeps its own faces and three
    collectives merge the results per bounce:

      closest-hit: lexicographic (t, global face) via pmin + a
        one-winner psum select of every G-buffer plane (global face =
        local face + chip offset, which IS the single-chip Morton
        index because shards slice the soup in order);
      any-hit: boolean OR (psum of the disjoint shards' occlusion).

    Per-chip sweep work drops ~linearly in the shard size — this is
    the axis that scales the 2M-face path-traced scenes the
    single-chip HBM streams today. Returns the replicated spp-SUM
    radiance image, bit-identical to single-chip render_pathtrace
    (tested on the 8-virtual-device CPU mesh). With an 'sp' mesh axis
    (make_gp_mesh(sp=...)) each sp rank traces its own key fold and the
    return becomes the MEAN over all sp*spp samples (the
    render_pathtrace_sharded convention); 'dp' shards image rows —
    all three axes compose."""
    import jax as _jax

    from ..ops.megakernel import (BLOCK_F, GBuffer, _should_stream,
                                  anyhit_pallas, anyhit_reordered_pallas,
                                  extend_shadow_pallas, gbuffer_pallas)
    from ..ops.pathtrace import render_pathtrace

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    n = mesh.shape["gp"]
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    rows, row0_fn, dp_spec = _dp_slab(mesh, height)
    stacked, rest = shard_scene_faces(scene, n)
    per = rest.num_faces
    big = jnp.int32(2 ** 30)

    def shard_fn(face_loc, rest_rep, uni_rep, key_rep):
        local = dataclasses.replace(
            rest_rep, **{k: v[0] for k, v in face_loc.items()})
        gpi = jax.lax.axis_index("gp")

        def merge_gb(gb):
            t = gb.t
            hit = jnp.isfinite(t)
            tmin = jax.lax.pmin(t, "gp")
            gface = jnp.where(hit, gb.face + gpi * per, big)
            fmin = jax.lax.pmin(jnp.where(t == tmin, gface, big), "gp")
            wchip = jax.lax.pmin(
                jnp.where((t == tmin) & (gface == fmin), gpi,
                          n).astype(jnp.int32), "gp")
            win = (t == tmin) & (gface == fmin) & (gpi == wchip)

            def sel(x):
                return jax.lax.psum(
                    jnp.where(win, x, jnp.zeros((), x.dtype)), "gp")

            return GBuffer(
                t=tmin, face=sel(jnp.where(hit, gb.face + gpi * per, 0)),
                u=sel(gb.u), v=sel(gb.v), nd=sel(gb.nd),
                uvx=sel(gb.uvx), uvy=sel(gb.uvy), nx=sel(gb.nx),
                ny=sel(gb.ny), nz=sel(gb.nz), mat=sel(gb.mat))

        def occ_or(o):
            return jax.lax.psum(o.astype(jnp.int32), "gp") > 0

        def chp(_s, origin, dx, dy, dz, **kw):
            return merge_gb(gbuffer_pallas(local, origin, dx, dy, dz,
                                           **kw))

        def es(_s, ox, oy, oz, dx, dy, dz,
               sox, soy, soz, sdx, sdy, sdz, act, **kw):
            gb, occ = extend_shadow_pallas(
                local, ox, oy, oz, dx, dy, dz,
                sox, soy, soz, sdx, sdy, sdz, act, **kw)
            return merge_gb(gb), occ_or(occ)

        def ahw(_s, px, py, pz, dx, dy, dz, act, **kw):
            ah = (anyhit_reordered_pallas
                  if _should_stream(local.padded_faces, BLOCK_F)
                  else anyhit_pallas)
            return occ_or(ah(local, px, py, pz, dx, dy, dz, act, **kw))

        k = key_rep[0]
        if sp > 1:
            # decorrelate path samples across the 'sp' axis; the mean
            # over all sp*spp samples rides one more psum (matching
            # tile_sharding.render_pathtrace_sharded semantics)
            k = jax.random.fold_in(k, jax.lax.axis_index("sp"))
        color = render_pathtrace(
            local, uni_rep, k, width=width, height=rows,
            bounces=bounces, spp=spp, background=background,
            interpret=interpret, row0=row0_fn(),
            total_height=height if dp > 1 else None,
            chp_fn=chp, es_fn=es, ah_fn=ahw)
        if sp > 1:
            color = jax.lax.psum(color, "sp") / (spp * sp)
        return color[None] if dp > 1 else color

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("gp"), stacked),
                  jax.tree.map(lambda _: P(), rest), P(), P()),
        out_specs=dp_spec, check_vma=False)
    out = fn(stacked, rest, jnp.asarray(uni_flat, jnp.float32),
             key[None])
    return out.reshape(height, width, 3) if dp > 1 else out
