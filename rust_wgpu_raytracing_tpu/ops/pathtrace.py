"""Path tracing with progressive accumulation (BASELINE config 4).

A capability EXTENSION over the reference (which casts primary rays
only): diffuse global illumination with next-event estimation toward the
scene's directional light(s), cosine-weighted bounces, and per-frame
progressive sample accumulation.

Design, TPU-first:
- paths are PLANAR ray state ((R,) component planes) stepped through a
  fixed bounce loop (static trip count — XLA-friendly control flow);
- bounce 0 uses the shared-origin Pallas G-buffer; later bounces run
  the FUSED extend+shadow sweep (megakernel.extend_shadow_pallas): the
  NEE shadow any-hit of bounce k and the closest-hit of bounce k+1 are
  independent ray wavefronts against the same geometry, so one kernel
  sweep serves both. Terminated paths carry zero directions + far
  origins so the cluster cull drops dead tiles (lane masking, not
  divergence);
- STATIC-CAPACITY wavefront compaction (round 5): a device trace of
  the 62 ms 1080p/4-bounce frame showed the Pallas sweeps cost ~1 ms
  each while ~43 ms was per-bounce XLA glue whose cost is per-INDEX
  over all 2M lanes regardless of activity — texture gathers (24 ms),
  winner-attribute expansion (19 ms) — at <=5% live rays after bounce
  0. Full-shape permutes are still a loss (the round-3 measurement
  that rejected naive compaction stands), but compacting the hit
  wavefront ONCE after the primary pass into a fixed-capacity buffer
  (cap = r/8, lane order preserved so screen-tile coherence survives)
  makes every per-bounce gather, expansion, and sweep activity-
  proportional. The capacity is static (XLA needs static shapes); a
  lax.cond falls back to the full-shape loop when the live count
  overflows (dense views), so results are bit-identical either way;
- randomness is jax.random (counter-based, reproducible) generated
  OUTSIDE the kernels on planar arrays; compacted lanes draw their
  uniforms by LANE ID via an explicit partitionable-threefry
  replication of jax.random.uniform (uniform_at — bit-identical to
  the full-shape draw, pinned by tests/test_pathtrace.py);
- materials: texture/sphere albedo as Lambertian reflectance; specular
  is ignored by the bounce BRDF (kept in the primary-hit NEE term as the
  reference's Blinn-Phong highlight so PT images stay recognizably
  "the same scene").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.camera import CameraUniforms
from ..core.scene import SceneData
from .intersect import HI
from .megakernel import (anyhit_pallas, anyhit_reordered_pallas,
                         extend_shadow_pallas, gbuffer_pallas,
                         _mat_const, _pick_tile_shape, _should_stream,
                         _spheres_occlude_planar, BLOCK_F,
                         sample_packed_texture,
                         sphere_pass_planar, tiled_to_image)
from .raygen import ndc_grid

F32_INF = float("inf")


def _jittered_dirs(width, height, uni: CameraUniforms, key, tile,
                   row0=None, total_height=None):
    """raygen + per-pixel sub-pixel jitter (anti-aliasing). With `tile`
    = (tile_h, tile_w, hpad) the rays come in (tile_h x tile_w)-pixel
    SCREEN-TILE order over a row-padded (hpad-tall) grid — exactly
    megakernel.raygen_planar_tiled's contract: bounce rays inherit the
    spatial coherence and the cluster culling keeps working on
    secondary rays. (Round-3 fix: this used to require width % 128 ==
    0, so 960-wide frames fell back to raster order whose 1024-pixel
    scanline strips have enormous cull cones — config 8's bounces=0
    cost 1065 ms of which ~1000 ms was that fallback.) Padding rows'
    rays use NDC y beyond the frame (true height in the divisor), so
    visible pixels stay bit-identical; the caller crops. row0/
    total_height select a row-slab viewport of a taller image
    (multi-chip dp sharding, same contract as megakernel.raygen_planar).
    """
    proj_inv = jnp.asarray(uni.proj_inv_wgpu, jnp.float32)
    view_inv = jnp.asarray(uni.view_inv, jnp.float32)
    m = jnp.matmul(view_inv[:3, :3], proj_inv[:3, :], precision=HI)
    const = m[:, 2] + m[:, 3]

    th = total_height or height
    if tile is not None:
        tile_h, tile_w, hpad = tile
        r = width * hpad
        tsz = tile_h * tile_w
        tiles_x = width // tile_w
        ridx = jnp.arange(r, dtype=jnp.int32)
        t_i = ridx // tsz
        within = ridx % tsz
        py = (t_i // tiles_x) * tile_h + within // tile_w
        px = (t_i % tiles_x) * tile_w + within % tile_w
        yb = py.astype(jnp.float32)
        if row0 is not None:
            yb = yb + row0
        xr = (2.0 * (px.astype(jnp.float32) + 0.5) / width) - 1.0
        yr = (2.0 * (yb + 0.5) / th) - 1.0
    else:
        r = width * height
        x_nds, _ = ndc_grid(width, th)
        y_idx = jnp.arange(height, dtype=jnp.float32)
        if row0 is not None:
            y_idx = y_idx + row0
        y_nds = (2.0 * (y_idx + 0.5) / th) - 1.0
        xr = jnp.tile(x_nds, height)
        yr = jnp.repeat(y_nds, width)
    kx, ky = jax.random.split(key)
    xr = xr + (jax.random.uniform(kx, (r,)) - 0.5) * (2.0 / width)
    yr = yr + (jax.random.uniform(ky, (r,)) - 0.5) * (2.0 / height)

    dx = m[0, 0] * xr + m[0, 1] * yr + const[0]
    dy = m[1, 0] * xr + m[1, 1] * yr + const[1]
    dz = m[2, 0] * xr + m[2, 1] * yr + const[2]
    inv_l = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv_l, dy * inv_l, dz * inv_l


def _threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 (20 rounds), vectorized over u32 planes x0/x1 —
    the exact core of JAX's counter-based PRNG, reimplemented so a
    COMPACTED wavefront can draw lane i's uniform without materializing
    the full plane (see uniform_at)."""
    rots = (13, 15, 26, 6, 17, 29, 16, 24)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(5):
        for r in rots[(i % 2) * 4:(i % 2) * 4 + 4]:
            x0 = x0 + x1
            x1 = (x1 << r) | (x1 >> (32 - r))
            x1 = x0 ^ x1
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def uniform_at(key, ids):
    """[0,1) uniforms for lane ids — BIT-IDENTICAL per lane to
    jax.random.uniform(key, (n,))[ids] under the (default)
    partitionable threefry: element i of a full draw is
    x0^x1 of threefry2x32(key, (i >> 32, i & 0xffffffff)) mapped to
    [1,2) by exponent-stuffing, minus 1. Pinned by
    tests/test_pathtrace.py::test_uniform_at_matches_jax — if a JAX
    upgrade changes the PRNG construction, that test fails loudly
    rather than silently diverging compact/full frames."""
    kd = jnp.asarray(key, jnp.uint32).reshape(-1)
    lo = ids.astype(jnp.uint32)
    hi = jnp.zeros_like(lo)  # lane counts < 2^32
    x0, x1 = _threefry2x32(kd[0], kd[1], hi, lo)
    bits = x0 ^ x1
    f = jax.lax.bitcast_convert_type(
        (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _cosine_sample(nx, ny, nz, key, ids=None):
    """Cosine-weighted hemisphere directions about planar normals.
    ids (i32, same shape): lane ids of a compacted wavefront — draws
    each lane's uniforms by id so compact/full frames are
    bit-identical; None = full-shape draw (identical values, one fused
    iota instead of a carried id plane)."""
    k1, k2 = jax.random.split(key)
    if ids is None:
        u1 = jax.random.uniform(k1, nx.shape)
        u2 = jax.random.uniform(k2, nx.shape)
    else:
        u1 = uniform_at(k1, ids)
        u2 = uniform_at(k2, ids)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))

    # orthonormal basis about n (branchless Frisvad-style)
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1x = 1.0 + sign * nx * nx * a
    t1y = sign * b
    t1z = -sign * nx
    t2x = b
    t2y = sign + ny * ny * a
    t2z = -ny

    dx = lx * t1x + ly * t2x + lz * nx
    dy = lx * t1y + ly * t2y + lz * ny
    dz = lx * t1z + ly * t2z + lz * nz
    return dx, dy, dz


def _closest_surface(gb_hit, gb, sph):
    """Merge mesh G-buffer and sphere hits into winner planes.

    sph: list of per-sphere (t, hit, nx, ny, nz). Returns dict of winner
    planes: t, hit, n, albedo (r,g,b), light dir, is_mesh."""
    t = jnp.where(gb_hit, gb.t, F32_INF)
    nx, ny, nz = gb.nx, gb.ny, gb.nz
    flip = gb.nd > 0.0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nz = jnp.where(flip, -nz, nz)
    is_mesh = gb_hit

    for i, (ts, hs, sx, sy, sz) in enumerate(sph):
        closer = hs & (ts < t)
        t = jnp.where(closer, ts, t)
        nx = jnp.where(closer, sx, nx)
        ny = jnp.where(closer, sy, ny)
        nz = jnp.where(closer, sz, nz)
        is_mesh = is_mesh & ~closer
    return t, nx, ny, nz, is_mesh


def _compact_tiles(active, tile_r, cap_tiles):
    """TILE-level compaction: indices of the first cap_tiles ray tiles
    that contain any active lane (+ the live-tile count). Lane-level
    compaction was measured and REJECTED on chip: per-LANE gathers of
    the ~20 state planes are latency-bound at ~27 ns/index (5-7 ms per
    plane at 261k lanes — 2.7x slower than not compacting), and the
    slot->lane scatter alone cost 9.6 ms. Whole-tile gathers move
    contiguous 4 KB rows instead — bandwidth-bound, ~0.03 ms for every
    plane together — and PT activity is spatially clustered (hit
    regions are contiguous objects), so at 1080p bounce 1 only ~9% of
    tiles are live. Tile order is preserved; within-tile lane order is
    untouched, so each gathered tile's cull mask and every per-lane
    value are bit-identical to the full-shape loop."""
    t_any = jnp.any(active.reshape(-1, tile_r), axis=1)
    n = t_any.shape[0]
    pos = jnp.cumsum(t_any.astype(jnp.int32)) - 1
    dest = jnp.where(t_any & (pos < cap_tiles), pos, cap_tiles + n)
    tidx = jnp.zeros((cap_tiles,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return tidx, pos[-1] + 1


def _bounce_loop(scene: SceneData, gb, sph, ox, oy, oz, dx, dy, dz,
                 active, ids, ks, *, bounces, bg, has_mesh, interpret,
                 es_fn, ah_fn):
    """The per-lane path state machine: NEE + cosine bounces over
    planar wavefronts of ANY static length. Runs either on the full
    ray set (ids=None) or on a compacted hit wavefront (ids = lane ids
    for by-id RNG draws). Returns the radiance planes (lr, lg, lb).
    Per-lane math is identical either way, so compact and full frames
    are bit-identical (tests/test_pathtrace.py pins it)."""
    r = dx.shape[0]
    beta_r = jnp.ones((r,))
    beta_g = jnp.ones((r,))
    beta_b = jnp.ones((r,))
    lr = jnp.zeros((r,))
    lg = jnp.zeros((r,))
    lb = jnp.zeros((r,))

    for bounce in range(bounces + 1):
        kb = jax.random.fold_in(ks, bounce + 1)

        if gb is not None:
            gb_hit = jnp.isfinite(gb.t) & active
            t, nx, ny, nz, is_mesh = _closest_surface(
                gb_hit, gb, [(ts, hs & active, sx, sy, sz)
                             for ts, hs, sx, sy, sz in sph])
        else:
            t = jnp.full((r,), F32_INF)
            nx = ny = nz = jnp.zeros((r,))
            is_mesh = jnp.zeros((r,), bool)
            for ts, hs, sx, sy, sz in sph:
                closer = hs & active & (ts < t)
                t = jnp.where(closer, ts, t)
                nx = jnp.where(closer, sx, nx)
                ny = jnp.where(closer, sy, ny)
                nz = jnp.where(closer, sz, nz)

        hit = active & jnp.isfinite(t)
        # environment on miss
        miss = active & ~hit
        lr = lr + jnp.where(miss, beta_r * bg[0], 0.0)
        lg = lg + jnp.where(miss, beta_g * bg[1], 0.0)
        lb = lb + jnp.where(miss, beta_b * bg[2], 0.0)

        # ---- albedo of the winning surface ----
        if gb is not None:
            tex_base = _mat_const(scene, gb.mat,
                                  lambda k: scene.mat_tex_base[k])
            hw_h = _mat_const(scene, gb.mat, lambda k: scene.mat_tex_h[k])
            hw_w = _mat_const(scene, gb.mat, lambda k: scene.mat_tex_w[k])
            # bilinear everywhere: the gather cost is per-INDEX on
            # this hardware (measured: a 3-row nearest gather costs
            # the same ~6 ms as the 12-row bilinear one), so point
            # sampling indirect albedo would change output for zero
            # speedup
            ar, ag, ab = sample_packed_texture(
                scene.tex_packed, tex_base, hw_h, hw_w,
                gb.uvx, 1.0 - gb.uvy, interpret=interpret)
            lx = _mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 0])
            ly = _mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 1])
            lz = _mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 2])
        else:
            ar = ag = ab = jnp.zeros((r,))
            lx = jnp.full((r,), 1.0)
            ly = jnp.full((r,), -1.0)
            lz = jnp.full((r,), -5.0)
        for i in range(scene.num_spheres):
            ts, hs, *_ = sph[i]
            sel = hit & ~is_mesh & hs & (ts == t)
            ar = jnp.where(sel, scene.sphere_color[i, 0], ar)
            ag = jnp.where(sel, scene.sphere_color[i, 1], ag)
            ab = jnp.where(sel, scene.sphere_color[i, 2], ab)
            lx = jnp.where(sel, scene.sphere_light[i, 0], lx)
            ly = jnp.where(sel, scene.sphere_light[i, 1], ly)
            lz = jnp.where(sel, scene.sphere_light[i, 2], lz)

        # ---- next-event estimation toward the directional light ----
        ll = jnp.sqrt(lx * lx + ly * ly + lz * lz)
        ll = jnp.where(ll > 0, ll, 1.0)
        sdx, sdy, sdz = -lx / ll, -ly / ll, -lz / ll
        ts_safe = jnp.where(hit, t, 0.0)
        px = ox + dx * ts_safe + nx * 1e-3
        py = oy + dy * ts_safe + ny * 1e-3
        pz = oz + dz * ts_safe + nz * 1e-3

        last = bounce == bounces
        if not last:
            # sample the NEXT extension wavefront now: its closest
            # hit is independent of this bounce's occlusion, so the
            # two ray sets share ONE fused kernel sweep (wavefront
            # fusion — see _make_fused_extend_shadow_kernel)
            bdx, bdy, bdz = _cosine_sample(nx, ny, nz, kb, ids)
            nactive = hit
            ndx = jnp.where(nactive, bdx, 0.0)
            ndy = jnp.where(nactive, bdy, 0.0)
            ndz = jnp.where(nactive, bdz, 0.0)
            # park terminated paths far away so the cluster cull
            # drops whole (tile, cluster) visits for dead regions
            far = 1e9
            nox = jnp.where(nactive, px, far)
            noy = jnp.where(nactive, py, far)
            noz = jnp.where(nactive, pz, far)

        occ = jnp.zeros((r,), bool)
        gb_next = None
        if has_mesh and not last:
            gb_next, occ = (es_fn or extend_shadow_pallas)(
                scene, nox, noy, noz, ndx, ndy, ndz,
                px, py, pz, sdx, sdy, sdz, hit, interpret=interpret)
        elif has_mesh:
            # act_cull=True on the VMEM any-hit: the last-bounce
            # shadow wavefront is mostly dead lanes (miss rays keep
            # a REAL light direction — only the act bound stops
            # them inflating every tile's cull interval; see
            # extend_shadow_pallas round-5 note)
            ah = ah_fn or (anyhit_reordered_pallas
                           if _should_stream(scene.padded_faces,
                                             BLOCK_F)
                           else functools.partial(anyhit_pallas,
                                                  act_cull=True))
            occ = ah(scene, px, py, pz, sdx, sdy, sdz, hit,
                     interpret=interpret)
        occ = occ | _spheres_occlude_planar(scene, px, py, pz,
                                            sdx, sdy, sdz)
        lam = jnp.maximum(0.0, nx * sdx + ny * sdy + nz * sdz)
        lam = jnp.where(hit & ~occ, lam, 0.0)
        lr = lr + beta_r * ar * lam
        lg = lg + beta_g * ag * lam
        lb = lb + beta_b * ab * lam

        if last:
            break

        # ---- advance the wavefront ----
        active = hit
        dx, dy, dz = ndx, ndy, ndz
        ox, oy, oz = nox, noy, noz
        beta_r = beta_r * jnp.where(active, ar, 0.0)
        beta_g = beta_g * jnp.where(active, ag, 0.0)
        beta_b = beta_b * jnp.where(active, ab, 0.0)
        gb = gb_next
        sph = [_sphere_perray(scene, i, ox, oy, oz, dx, dy, dz)
               for i in range(scene.num_spheres)]

    return lr, lg, lb


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "bounces", "spp", "background", "interpret",
    "total_height", "chp_fn", "es_fn", "ah_fn", "compact_cap"))
def render_pathtrace(scene: SceneData, uni_flat, key, *, width: int,
                     height: int, bounces: int = 4, spp: int = 1,
                     background=(0.0, 0.0, 0.0), interpret: bool = False,
                     accum=None, row0=None, total_height=None,
                     chp_fn=None, es_fn=None, ah_fn=None,
                     compact_cap=None):
    """Trace `spp` full paths per pixel; returns the SUM of radiance
    (H, W, 3) — caller divides by total accumulated spp (progressive
    accumulation lives in the Renderer). accum (optional, (H, W, 3)):
    running radiance sum folded into the SAME jit — a separate eager
    add costs a ~3 ms dispatch per frame on tunneled backends.
    row0/total_height: render a row slab of a taller image (multi-chip
    dp sharding — see parallel.tile_sharding.render_pathtrace_sharded).
    chp_fn/es_fn/ah_fn (static): override the three mesh-intersection
    passes (primary closest-hit, fused extend+shadow, last-bounce
    any-hit) with same-signature wrappers — the geometry-parallel path
    tracer injects collectives-merging wrappers here so the whole
    per-ray state machine is shared (parallel/geometry_sharding.py).
    compact_cap (static): None = full-shape bounce loop; "auto" =
    compact the post-primary hit wavefront to r//8 lanes when the
    scene is VMEM-resident (module docstring — this is where the
    round-5 4x on BASELINE config 4 comes from); int = explicit
    capacity. Bit-identical to None either way (lax.cond falls back to
    the full loop when the live count exceeds the capacity)."""
    uni = CameraUniforms.unflat(jnp.asarray(uni_flat, jnp.float32))
    has_mesh = scene.num_faces > 0
    tile = _pick_tile_shape(width, height)
    r = width * (tile[2] if tile is not None else height)
    bg = jnp.asarray(background, jnp.float32)

    if compact_cap == "auto":
        # worth it only when the per-bounce glue runs at frame scale
        # and the sweeps stay on the VMEM (non-streamed) kernel
        streamed = has_mesh and _should_stream(scene.padded_faces, BLOCK_F)
        compact_cap = (r // 8) if (has_mesh and not streamed
                                   and r % 1024 == 0
                                   and r >= 8 * 1024) else None
    loop_kw = dict(bounces=bounces, bg=bg, has_mesh=has_mesh,
                   interpret=interpret, es_fn=es_fn, ah_fn=ah_fn)

    acc_r = jnp.zeros((r,))
    acc_g = jnp.zeros((r,))
    acc_b = jnp.zeros((r,))

    for s in range(spp):
        ks = jax.random.fold_in(key, s)
        dx, dy, dz = _jittered_dirs(width, height, uni, ks, tile,
                                    row0=row0, total_height=total_height)
        ox = jnp.full((r,), uni.origin[0])
        oy = jnp.full((r,), uni.origin[1])
        oz = jnp.full((r,), uni.origin[2])

        # primary closest hit (shared-origin kernel); later bounces
        # arrive pre-computed by the FUSED extend+shadow sweep below
        gb = ((chp_fn or gbuffer_pallas)(scene, uni.origin, dx, dy, dz,
                                         interpret=interpret)
              if has_mesh else None)
        sph = [sphere_pass_planar(scene, i, uni.origin, dx, dy, dz)
               for i in range(scene.num_spheres)]

        if compact_cap is None or r % 1024 != 0:
            lr, lg, lb = _bounce_loop(
                scene, gb, sph, ox, oy, oz, dx, dy, dz,
                active=jnp.ones((r,), bool), ids=None, ks=ks, **loop_kw)
        else:
            tr = 1024
            cap_t = max(1, int(compact_cap) // tr)
            n_tiles = r // tr
            # the whole bounce loop only ever touches lanes whose
            # PRIMARY ray hit something — misses get one bg add
            hit0 = jnp.isfinite(gb.t) if gb is not None \
                else jnp.zeros((r,), bool)
            for ts_, hs_, *_rest in sph:
                hit0 = hit0 | hs_
            t_any = jnp.any(hit0.reshape(n_tiles, tr), axis=1)
            n_act = jnp.sum(t_any.astype(jnp.int32))

            def _compact(_):
                tidx, _n = _compact_tiles(hit0, tr, cap_t)
                tile_live = jnp.arange(cap_t, dtype=jnp.int32) < n_act
                take = lambda a: a.reshape(n_tiles, tr)[tidx].reshape(-1)
                gbc = jax.tree_util.tree_map(take, gb) \
                    if gb is not None else None
                sphc = [tuple(take(p) for p in planes) for planes in sph]
                active0 = take(hit0) & jnp.repeat(tile_live, tr)
                ids = (tidx[:, None] * tr
                       + jnp.arange(tr, dtype=jnp.int32)[None, :]
                       ).reshape(-1)
                lrc, lgc, lbc = _bounce_loop(
                    scene, gbc, sphc,
                    take(ox), take(oy), take(oz),
                    take(dx), take(dy), take(dz),
                    active=active0, ids=ids, ks=ks, **loop_kw)
                mb = (~hit0).astype(jnp.float32)
                outs = []
                live_f = jnp.repeat(tile_live, tr).astype(jnp.float32)
                for p, b in ((lrc, bg[0]), (lgc, bg[1]), (lbc, bg[2])):
                    full = jnp.zeros((n_tiles, tr)).at[tidx].add(
                        (p * live_f).reshape(cap_t, tr)).reshape(-1)
                    outs.append(full + mb * b)
                return tuple(outs)

            def _full(_):
                return _bounce_loop(
                    scene, gb, sph, ox, oy, oz, dx, dy, dz,
                    active=jnp.ones((r,), bool), ids=None, ks=ks,
                    **loop_kw)

            lr, lg, lb = jax.lax.cond(n_act <= cap_t, _compact, _full, 0)

        acc_r = acc_r + lr
        acc_g = acc_g + lg
        acc_b = acc_b + lb

    if tile is not None:
        tile_h, tile_w, hpad = tile
        color = jnp.stack(
            [tiled_to_image(p, width, hpad, tile_h, tile_w)[:height]
             for p in (acc_r, acc_g, acc_b)], axis=-1)
    else:
        color = jnp.stack(
            [acc_r.reshape(height, width), acc_g.reshape(height, width),
             acc_b.reshape(height, width)], axis=-1)
    if accum is not None:
        color = color + accum
    return color


def _sphere_perray(scene, i, ox, oy, oz, dx, dy, dz):
    """sphere_pass_planar with per-ray origins + epsilon for bounces."""
    cx, cy, cz = (scene.sphere_center[i, 0], scene.sphere_center[i, 1],
                  scene.sphere_center[i, 2])
    radius = scene.sphere_radius[i]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    c = (ocx * ocx + ocy * ocy + ocz * ocz) - radius * radius
    disc = b * b - 4.0 * a * c
    a_safe = jnp.where(jnp.abs(a) > 1e-20, a, 1.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a_safe)
    t2 = (-b + sq) / (2.0 * a_safe)
    t = jnp.where(t1 >= 1e-3, t1, jnp.where(t2 >= 1e-3, t2, F32_INF))
    t = jnp.where((disc < 0.0) | (jnp.abs(a) <= 1e-20), F32_INF, t)
    hit = jnp.isfinite(t)
    ts = jnp.where(hit, t, 0.0)
    pxx, pyy, pzz = ox + dx * ts, oy + dy * ts, oz + dz * ts
    nx, ny, nz = pxx - cx, pyy - cy, pzz - cz
    l = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    l = jnp.where(l > 0, l, 1.0)
    return t, hit, nx / l, ny / l, nz / l
