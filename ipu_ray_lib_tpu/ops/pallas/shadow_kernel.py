"""Fused shadow-trace kernel: primary walk + occlusion + shading state
in ONE pallas_call (round 5, VERDICT r4 #4).

The reference ships ShadowTrace as a first-class device kernel
(codelets/TraceCodelets.cpp:269-316: primary hit + one occlusion ray to
a fixed light + lambertian/ambient via traceShadowRay,
include/Render.hpp:37-72). Until round 5 this repo ran the mode as two
separate pallas intersect dispatches glued by XLA shading
(ops/traversal.py pallas_scene_intersect / scene_occluded +
render/shadow.py) — correct, but structured as 3 device round trips per
chunk. This kernel fuses the whole per-ray pipeline:

    primary closest-hit walk  (scalar-prefetch culled near-to-far walk —
                               the exact dense-step math of
                               intersect_kernel._dense_kernel)
    sphere/disc overrides     (in-kernel twins of ops/dense.py
                               dense_spheres / dense_discs, same op order)
    normal + hit point        (the pallas_scene_intersect glue, in-kernel)
    shadow ray generation     (render/shadow.py lines, in-kernel:
                               offset_ray_origin + light direction)
    occlusion walk            (in-kernel per-block conservative slab
                               flags -> gated walk; same acceptance maths)
    occlusion ap tests        (sphere/disc occluders)
    lambert term              (shadow shading numerator)

Albedo lookup and the final two-product blend stay in a thin XLA
epilogue (fused_shadow_trace below) because they are per-lane gathers
over the material tables — everything else is the one kernel.

Bitwise contract: on the CPU backend (interpret mode) the fused mode is
gated BITWISE against the original glue mode for the full AOV set
(tests/test_render_e2e.py); on TPU the oracle AOV-parity gates apply
unchanged. Every formula below deliberately mirrors its glue twin's
operation order — comments name the twin.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...bvh.builder import INVALID_GEOM_ID
from ...utils.constants import MACHINE_EPSILON, RAY_EPSILON
from .intersect_kernel import _INF, _SLAB_SCALE, BR, block_cull_lists_bundle
from .tables import TB, BlockedSceneTables

_BIG = np.float32(1e30)


def _shadow_kernel(count_ref, list_ref, dist_ref, rays_ref, p_ref, nrm_ref,
                   baabb_ref, sph_ref, dsc_ref,
                   out_f_ref, out_i_ref,
                   bt_ref, bi_ref, bn_ref, sf_ref,
                   *, br, nb, n_sph, n_dsc, light, ambient):
    i = pl.program_id(0)
    f32 = jnp.float32
    i32 = jnp.int32
    rays = rays_ref[:]                     # [8, br]
    o_rows = [rays[a:a + 1, :] for a in range(3)]
    d_rows = [rays[a:a + 1, :] for a in range(3, 6)]
    t_min = rays[6:7, :]
    t_max = rays[7:8, :]

    # ---- dense block test (verbatim twin of intersect_kernel.
    # _dense_kernel's `step`, so the primary winner/normal are bitwise
    # the glue path's even on TPU; material payload dot dropped — the
    # shadow glue resolves materials by geom-id gather, not payload) ----
    def test_block(blk, orows, drows, tmin_row, with_normal):
        best_t = bt_ref[:]
        pb = p_ref[pl.ds(blk * TB, TB), :]                 # [TB, 16]
        tnp0 = pb[:, 0:1]
        g1p0 = pb[:, 1:2]
        g2p0 = pb[:, 2:3]

        def tdot(c0, rr):
            return (
                pb[:, c0:c0 + 1] * rr[0]
                + pb[:, c0 + 1:c0 + 2] * rr[1]
                + pb[:, c0 + 2:c0 + 3] * rr[2]
            )

        on = tdot(3, orows)
        dn = tdot(3, drows)
        og1 = tdot(6, orows)
        dg1 = tdot(6, drows)
        og2 = tdot(9, orows)
        dg2 = tdot(9, drows)

        r = pl.reciprocal(dn, approx=True)
        r = r * (2.0 - dn * r)
        t = (tnp0 - on) * r
        b1 = og1 + t * dg1 - g1p0
        b2 = og2 + t * dg2 - g2p0
        o_mag = jnp.maximum(jnp.maximum(jnp.abs(orows[0]),
                                        jnp.abs(orows[1])),
                            jnp.abs(orows[2]))
        et = (pb[:, 14:15] + jnp.abs(on)) * jnp.abs(r)
        eps = jnp.minimum(
            pb[:, 12:13] + pb[:, 13:14] * (o_mag + et),
            np.float32(1e-3))
        ok = (
            (jnp.minimum(b1, b2) >= -eps) & (b1 + b2 <= 1.0 + eps)
            & (t > tmin_row)
        )
        tm = jnp.where(ok, t, _INF)
        bt = jnp.min(tm, axis=0, keepdims=True)            # [1, br]
        lane = jax.lax.broadcasted_iota(i32, (TB, br), 0) + blk * TB
        bi = jnp.min(
            jnp.where(tm <= bt, lane, jnp.int32(0x7FFFFFFF)),
            axis=0, keepdims=True,
        )
        better = (bt < best_t) & (bt < _INF)
        bt_ref[:] = jnp.where(better, bt, best_t)
        bi_ref[:] = jnp.where(better, bi, bi_ref[:])
        if with_normal:
            onehot = (lane == bi).astype(jnp.float32)      # [TB, br]
            nrm_blk = nrm_ref[:, pl.ds(blk * 3 * TB, 3 * TB)]
            w1 = onehot
            w2 = onehot * jnp.where(ok, b1, 0.0)
            w3 = onehot * jnp.where(ok, b2, 0.0)
            nd = (((1,), (0,)), ((), ()))
            n_cand = jax.lax.dot_general(
                nrm_blk[:, 0:TB], w1, nd, preferred_element_type=jnp.float32)
            n_interp = (
                jax.lax.dot_general(nrm_blk[0:3, TB:2 * TB], w2, nd,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(nrm_blk[0:3, 2 * TB:3 * TB], w3, nd,
                                      preferred_element_type=jnp.float32)
            )
            n_cand = jnp.concatenate([n_cand[0:3] + n_interp, n_cand[3:8]],
                                     axis=0)
            bn_ref[:] = jnp.where(better, n_cand, bn_ref[:])
        return 0

    # ---- primary walk: the glue's scalar-prefetch near-to-far walk with
    # distance early-stop (intersect_kernel._dense_kernel loop) ----------
    bt_ref[:] = t_max
    bi_ref[:] = jnp.full((1, br), -1, i32)
    bn_ref[:] = jnp.zeros((8, br), f32)

    CHECK_EVERY = 4
    count = count_ref[i]

    def cond(carry):
        j, stop = carry
        return (j < count) & jnp.logical_not(stop)

    def loop(carry):
        j, _ = carry
        test_block(list_ref[i, j], o_rows, d_rows, t_min, True)
        j = j + 1
        do_check = (j % CHECK_EVERY == 0) & (j < nb)
        worst = jnp.max(bt_ref[:])
        stop = jnp.where(do_check, worst < dist_ref[i, j % nb], False)
        return j, stop

    jax.lax.while_loop(cond, loop, (jnp.int32(0), False))

    tri = bi_ref[:]                                        # [1, br]
    found_tri = tri >= 0
    # pallas_intersect epilogue: t = where(found, bt, t_max):
    best_t = jnp.where(found_tri, bt_ref[:], t_max)
    n_raw = bn_ref[0:3, :]                                 # raw interp normal

    # ---- analytic primitive overrides: in-kernel twins of ops/dense.py
    # dense_spheres / dense_discs driven exactly like
    # pallas_scene_intersect lines 274-307 ------------------------------
    def sphere_pass(orows, drows, tmin_row, bound, want_center):
        """Twin of dense_spheres: returns (better, t, idx[, center])."""
        dx, dy, dz = drows
        ox, oy, oz = orows
        rd2 = 1.0 / (dx * dx + dy * dy + dz * dz)
        cur_t = jnp.full((1, br), _INF)
        cur_i = jnp.zeros((1, br), i32)
        cur_c = [jnp.zeros((1, br), f32) for _ in range(3)]
        for s in range(n_sph):
            cx = sph_ref[s, 0] + jnp.zeros((1, br), f32)
            cy = sph_ref[s, 1] + jnp.zeros((1, br), f32)
            cz = sph_ref[s, 2] + jnp.zeros((1, br), f32)
            r2 = sph_ref[s, 3] * sph_ref[s, 3]
            ocx = cx - ox
            ocy = cy - oy
            ocz = cz - oz
            tca = (ocx * dx + ocy * dy + ocz * dz) * rd2
            lx = ocx - dx * tca
            ly = ocy - dy * tca
            lz = ocz - dz * tca
            l2 = lx * lx + ly * ly + lz * lz
            td = jnp.sqrt(jnp.maximum(r2 - l2, 0.0)) * rd2
            t0 = tca - td
            t1 = tca + td
            t = jnp.where(t0 < tmin_row, t1, t0)
            miss = ((tca < 0.0) | (l2 > r2) | (t < tmin_row)
                    | (r2 <= 0.0))
            t = jnp.where(miss | (t <= tmin_row), _INF, t)
            upd = t < cur_t
            cur_t = jnp.where(upd, t, cur_t)
            cur_i = jnp.where(upd, i32(s), cur_i)
            if want_center:
                cur_c = [jnp.where(upd, c, cc)
                         for c, cc in zip((cx, cy, cz), cur_c)]
        better = cur_t < bound
        if want_center:
            return better, cur_t, cur_i, cur_c
        return better, cur_t, cur_i

    def disc_pass(orows, drows, tmin_row, bound, want_normal):
        """Twin of dense_discs: returns (better, t, idx[, normal])."""
        dx, dy, dz = drows
        ox, oy, oz = orows
        cur_t = jnp.full((1, br), _INF)
        cur_i = jnp.zeros((1, br), i32)
        cur_n = [jnp.zeros((1, br), f32) for _ in range(3)]
        for s in range(n_dsc):
            nx = dsc_ref[s, 0] + jnp.zeros((1, br), f32)
            ny = dsc_ref[s, 1] + jnp.zeros((1, br), f32)
            nz = dsc_ref[s, 2] + jnp.zeros((1, br), f32)
            cx = dsc_ref[s, 3] + jnp.zeros((1, br), f32)
            cy = dsc_ref[s, 4] + jnp.zeros((1, br), f32)
            cz = dsc_ref[s, 5] + jnp.zeros((1, br), f32)
            r2 = dsc_ref[s, 6] * dsc_ref[s, 6]
            d_off = jnp.abs(dsc_ref[s, 3] * dsc_ref[s, 0]
                            + dsc_ref[s, 4] * dsc_ref[s, 1]
                            + dsc_ref[s, 5] * dsc_ref[s, 2])
            angle = dx * nx + dy * ny + dz * nz
            t = -((ox * nx + oy * ny + oz * nz) + d_off) / angle
            hx = ox + dx * t - cx
            hy = oy + dy * t - cy
            hz = oz + dz * t - cz
            d2 = hx * hx + hy * hy + hz * hz
            ok = ((angle != 0.0) & (t > np.float32(MACHINE_EPSILON))
                  & (d2 < r2) & (r2 > 0.0) & (t > tmin_row))
            t = jnp.where(ok, t, _INF)
            upd = t < cur_t
            cur_t = jnp.where(upd, t, cur_t)
            cur_i = jnp.where(upd, i32(s), cur_i)
            if want_normal:
                cur_n = [jnp.where(upd, c, cc)
                         for c, cc in zip((nx, ny, nz), cur_n)]
        better = cur_t < bound
        if want_normal:
            return better, cur_t, cur_i, cur_n
        return better, cur_t, cur_i

    sb, st, si, s_c = sphere_pass(o_rows, d_rows, t_min, best_t, True)
    best_t = jnp.where(sb, st, best_t)
    db, dtt, di, d_n = disc_pass(o_rows, d_rows, t_min, best_t, True)
    best_t = jnp.where(db, dtt, best_t)

    found = found_tri | sb | db
    hit_t = jnp.where(found, best_t, t_max)                # hit.t

    # ---- normals + hit point (pallas_scene_intersect with_normal glue,
    # then render/shadow.py shadow_trace lines, all same op order) ------
    knorm = jnp.sqrt(n_raw[0:1] * n_raw[0:1] + n_raw[1:2] * n_raw[1:2]
                     + n_raw[2:3] * n_raw[2:3])
    kinv = jnp.maximum(knorm, np.float32(1e-30))
    kn = [n_raw[c:c + 1] / kinv for c in range(3)]
    hp_t = jnp.where(found, hit_t, 0.0)                    # shadow_trace:56
    hit_p = [o_rows[c] + d_rows[c] * hp_t for c in range(3)]
    spn = [hit_p[c] - s_c[c] for c in range(3)]
    snorm = jnp.sqrt(spn[0] * spn[0] + spn[1] * spn[1] + spn[2] * spn[2])
    sinv = jnp.maximum(snorm, np.float32(1e-30))
    spn = [spn[c] / sinv for c in range(3)]
    normal = [jnp.where(sb, spn[c], kn[c]) for c in range(3)]
    normal = [jnp.where(db, d_n[c], normal[c]) for c in range(3)]
    default_n = (jnp.zeros((1, br), f32), jnp.zeros((1, br), f32),
                 jnp.full((1, br), 1.0, f32))
    normal = [jnp.where(found, normal[c], default_n[c]) for c in range(3)]

    lgt = [np.float32(light[c]) for c in range(3)]
    loff = [lgt[c] - hit_p[c] for c in range(3)]
    dist = jnp.sqrt(loff[0] * loff[0] + loff[1] * loff[1]
                    + loff[2] * loff[2])
    dinv = jnp.maximum(dist, np.float32(1e-30))
    sdir = [loff[c] / dinv for c in range(3)]
    # offset_ray_origin (ops/bxdf.py:121-128):
    mag = 1.0 + jnp.maximum(jnp.maximum(jnp.abs(hit_p[0]),
                                        jnp.abs(hit_p[1])),
                            jnp.abs(hit_p[2]))
    sgn = jnp.sign(normal[0] * sdir[0] + normal[1] * sdir[1]
                   + normal[2] * sdir[2])
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    m_off = mag * np.float32(RAY_EPSILON) * sgn
    sorig = [hit_p[c] + normal[c] * m_off for c in range(3)]

    lambert = sdir[0] * normal[0] + sdir[1] * normal[1] + sdir[2] * normal[2]

    # ---- occlusion walk (scene_occluded glue, in-kernel) --------------
    # Conservative per-block slab flags against the shadow rays (any
    # flag SUPERSET leaves the closest-hit winner unchanged, so this
    # pass needs no bitwise twin — only conservatism):
    nb_pad = sf_ref.shape[0]
    tin = jnp.full((nb_pad, br), -_INF)
    tout = jnp.full((nb_pad, br), _INF)
    blo0 = baabb_ref[:, 0:1]
    for a in range(3):
        lo_a = baabb_ref[:, a:a + 1]                       # [nb_pad, 1]
        hi_a = baabb_ref[:, a + 3:a + 4]
        d_a = sdir[a]
        o_a = sorig[a]
        safe = jnp.where(d_a == 0.0, 1.0, d_a)
        inv = 1.0 / safe
        t1 = (lo_a - o_a) * inv                            # [nb_pad, br]
        t2 = (hi_a - o_a) * inv
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2) * _SLAB_SCALE
        # Zero-direction axes give no constraint unless the origin lies
        # outside the slab (then the ray can never enter it):
        inside = (o_a >= lo_a) & (o_a <= hi_a)
        tn = jnp.where(d_a == 0.0, jnp.where(inside, -_INF, _INF), tn)
        tf = jnp.where(d_a == 0.0, jnp.where(inside, _INF, -_INF), tf)
        tin = jnp.maximum(tin, tn)
        tout = jnp.minimum(tout, tf)
    bhit = ((tin <= tout) & (tout >= 0.0) & (tin <= dist)
            & (blo0 < _BIG))
    sf_ref[:, 0:1] = jnp.max(bhit.astype(f32), axis=1, keepdims=True)

    bt_ref[:] = dist                                       # occlusion bound
    bi_ref[:] = jnp.full((1, br), -1, i32)

    def swalk(blk, _):
        pl.when(sf_ref[blk, 0] > 0.0)(
            lambda: (test_block(blk, sorig, sdir, t_min, False), None)[1])
        return 0

    jax.lax.fori_loop(0, nb, swalk, 0)
    s_tri_hit = bi_ref[:] >= 0
    s_best = jnp.where(s_tri_hit, bt_ref[:], dist)
    ssb, sst, _ssi = sphere_pass(sorig, sdir, t_min, s_best, False)
    s_best = jnp.where(ssb, sst, s_best)
    sdb, sdt, _sdi = disc_pass(sorig, sdir, t_min, s_best, False)
    s_best = jnp.where(sdb, sdt, s_best)
    s_found = s_tri_hit | ssb | sdb
    # scene_occluded: found & (hit.t < t_max), hit.t = where(found, t, dist):
    occ = s_found & (jnp.where(s_found, s_best, dist) < dist)

    # ---- outputs ------------------------------------------------------
    # Decisions (walk winners + occlusion) come from the kernel; the
    # value-level shading (normalize / light direction / lambert / rgb)
    # is recomputed in the XLA epilogue with the glue path's exact
    # expressions so XLA's in-context op fusion (FMA contraction on the
    # dot/normalize chains — measured 1-ulp deltas otherwise) matches
    # the glue program's. The kernel's own normal/sdir above exist only
    # to aim the occlusion walk:
    out_f_ref[0:3, :] = n_raw                              # raw tri normal
    out_f_ref[3:4, :] = hit_t                              # hit.t
    out_f_ref[4:8, :] = jnp.zeros((4, br), f32)
    out_i_ref[0:1, :] = tri
    out_i_ref[1:2, :] = jnp.where(sb, si, i32(-1))
    out_i_ref[2:3, :] = jnp.where(db, di, i32(-1))
    out_i_ref[3:4, :] = occ.astype(i32)
    out_i_ref[4:8, :] = jnp.zeros((4, br), i32)


@functools.partial(
    jax.jit,
    static_argnames=("light", "ambient", "interpret", "br"),
)
def fused_shadow_trace_arrays(scene, origins, dirs, *, light, ambient,
                              interpret=False, br: int | None = None):
    """One fused shadow-trace dispatch over [R] rays; returns the raw
    (out_f [8, R], out_i [8, R]) kernel outputs (see _shadow_kernel)."""
    tables: BlockedSceneTables = scene.blocked
    if tables.p is None:
        raise RuntimeError(
            "fused shadow kernel needs the VMEM-layout p table; use the "
            "glue path (RAY_SHADOW_FUSED=0) or intersector='pallas-hbm'")
    br = br or BR
    R = origins.shape[0]
    Rp = -(-R // br) * br
    pad = Rp - R
    nrb = Rp // br

    def padr(a, fill=0.0):
        cfg = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    o_pad = padr(origins)
    d_pad = padr(dirs, 1.0)
    tmin_pad = padr(jnp.zeros(R, jnp.float32))
    tmax_pad = padr(jnp.full(R, _INF), -1.0)

    counts, order, dists = block_cull_lists_bundle(
        tables, o_pad, d_pad, tmin_pad, tmax_pad, nrb, br
    )
    rays = jnp.concatenate(
        [o_pad.T, d_pad.T, tmin_pad[None, :], tmax_pad[None, :]], axis=0
    )

    nb = tables.num_blocks
    nb_pad = -(-nb // 8) * 8
    baabb = jnp.pad(tables.baabb, ((0, nb_pad - nb), (0, 0)),
                    constant_values=_BIG)
    n_sph = int(scene.spheres.shape[0])
    n_dsc = int(scene.discs.shape[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nrm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # baabb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # spheres
            pl.BlockSpec(memory_space=pltpu.VMEM),   # discs
        ],
        out_specs=[
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, br), jnp.float32),
            pltpu.VMEM((1, br), jnp.int32),
            pltpu.VMEM((8, br), jnp.float32),
            pltpu.VMEM((nb_pad, 128), jnp.float32),
        ],
    )
    out_f, out_i = pl.pallas_call(
        functools.partial(_shadow_kernel, br=br, nb=nb,
                          n_sph=n_sph, n_dsc=n_dsc,
                          light=light, ambient=ambient),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(counts, order, dists, rays, tables.p, tables.nrm, baabb,
      scene.spheres, scene.discs)
    return out_f[:, :R], out_i[:, :R]


def fused_shadow_trace(scene, origins, dirs, light_pos, ambient):
    """Fused shadow-trace: kernel (all walk + occlusion decisions) + an
    XLA epilogue carrying the glue path's value-level shading verbatim
    (pallas_scene_intersect:270-307 + render/shadow.py shadow_trace) so
    the whole mode is bitwise-identical to the glue on CPU — the
    decisions are banked by the kernel, the floats are produced by the
    same XLA expressions the glue fuses."""
    from ...render.shadow import TraceResultSoA
    from ...ops.traversal import INVALID_PRIM_ID

    interpret = jax.default_backend() != "tpu"
    out_f, out_i = fused_shadow_trace_arrays(
        scene, origins, dirs,
        light=tuple(float(v) for v in light_pos),
        ambient=float(ambient), interpret=interpret)

    inf = jnp.float32(jnp.inf)
    zero = jnp.float32(0.0)
    n_raw = out_f[0:3].T                                   # [R, 3]
    hit_t = out_f[3]                                       # hit.t
    tri = out_i[0]
    si_b = out_i[1]
    di_b = out_i[2]
    occ = out_i[3] != 0
    sb = si_b >= 0
    db = di_b >= 0

    # pallas_intersect epilogue (normal normalisation):
    knormal = n_raw / jnp.maximum(
        jnp.linalg.norm(n_raw, axis=-1, keepdims=True), jnp.float32(1e-30)
    )
    # pallas_scene_intersect:270-307 (id resolution + analytic normals):
    tri_safe = jnp.clip(tri, 0, scene.blocked.tri_geom.shape[0] - 1)
    geom = jnp.where(tri >= 0, scene.blocked.tri_geom[tri_safe],
                     INVALID_GEOM_ID)
    prim = jnp.where(tri >= 0, scene.blocked.tri_prim[tri_safe],
                     INVALID_PRIM_ID)
    si_safe = jnp.clip(jnp.where(sb, si_b, 0), 0,
                       scene.sphere_geom.shape[0] - 1)
    geom = jnp.where(sb, scene.sphere_geom[si_safe], geom)
    prim = jnp.where(sb, 0, prim)
    di_safe = jnp.clip(jnp.where(db, di_b, 0), 0,
                       scene.disc_geom.shape[0] - 1)
    geom = jnp.where(db, scene.disc_geom[di_safe], geom)
    prim = jnp.where(db, 0, prim)
    geom = geom.astype(jnp.int32)
    found = geom != INVALID_GEOM_ID

    hp_int = origins + dirs * hit_t[..., None]             # internal hp
    si_c = jnp.clip(jnp.where(sb, si_b, 0), 0, scene.spheres.shape[0] - 1)
    sp = scene.spheres[si_c]
    sphere_n = hp_int - sp[..., :3]
    sphere_n = sphere_n / jnp.maximum(
        jnp.linalg.norm(sphere_n, axis=-1, keepdims=True), jnp.float32(1e-30)
    )
    di_c = jnp.clip(jnp.where(db, di_b, 0), 0, scene.discs.shape[0] - 1)
    disc_n = scene.discs[di_c][..., 0:3]
    normal = jnp.where(sb[..., None], sphere_n, knormal)
    normal = jnp.where(db[..., None], disc_n, normal)
    default = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                               normal.shape)
    normal = jnp.where(found[..., None], normal, default)

    # render/shadow.py shadow_trace:56-70, same expressions:
    hit_p = origins + dirs * jnp.where(found, hit_t, zero)[..., None]
    light = jnp.asarray(light_pos, jnp.float32)
    light_offset = light[None, :] - hit_p
    dist = jnp.sqrt(jnp.sum(light_offset * light_offset, axis=-1))
    sdir = light_offset / jnp.maximum(dist[..., None], jnp.float32(1e-30))
    g_safe = jnp.clip(geom, 0, scene.mat_id.shape[0] - 1)
    albedo = scene.mat_albedo[scene.mat_id[g_safe]]
    lambert = jnp.sum(sdir * normal, axis=-1)
    rgb = albedo * ambient + jnp.where(occ, zero, lambert)[..., None] * albedo
    rgb = jnp.where(found[..., None], rgb, zero)

    return TraceResultSoA(
        rgb=rgb,
        t=jnp.where(found, hit_t, inf),
        geom_id=jnp.where(found, geom, INVALID_GEOM_ID),
        prim_id=prim.astype(jnp.int32),
        normal=normal,
        hit_p=jnp.where(found[..., None], hit_p, zero),
        escaped=~found,
    )
