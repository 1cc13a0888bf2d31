"""Pallas fully-fused MLP evaluation for the distilled render field.

The tiny-cuda-nn role (reference instant-ngp's CUDA fused MLPs, used for all
NeRF queries) rebuilt for TPU: the plain XLA path materializes every hidden
activation (128 x N_samples, N ~ 5M per reference render) through HBM between
layers, making the distilled-field render HBM-bound (~61 ms measured for a
320x240x64 render on v5e). This kernel keeps the whole network — frequency
encoding, 4-layer trunk, density head, SH direction encoding, 3-layer color
net — in VMEM for a tile of samples, so HBM traffic is just positions in
(3N f32) and sigma+rgb out (4N f32): ~150x less than the layer-by-layer path.

Layout is feature-major (C, N): channels in sublanes, samples in lanes, so
every layer is one MXU matmul (C_out, C_in) @ (C_in, N_tile). Weights are
bf16 with f32 accumulation (preferred_element_type), matching the precision
of the plain path within bf16 rounding.

Used by nerf/render.py when the field is a DistilledField (RenderConfig.fused)
— the per-frame tracking render path (reference r9:145-152, 207-214).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixtrack_tpu.nerf.field import sh_encoding_deg4_T

# lane tile: samples per kernel invocation. 8192 keeps the widest activation
# (128 x 8192 bf16 = 2 MB) + double-buffered IO well inside 16 MB VMEM.
TILE_N = 8192


def _fused_kernel(octaves, depth,
                  x_ref, d_ref,
                  w1_ref, b1_ref, wt_ref, bt_ref, wh_ref, bh_ref,
                  wc1_ref, bc1_ref, wc2_ref, bc2_ref, wc3_ref, bc3_ref,
                  out_ref):
    """One TILE_N-sample tile: encode -> trunk -> head -> color -> out.

    wt_ref/bt_ref stack the (depth-1) inner trunk layers on a leading axis.
    Padded rows/cols are zero so they contribute nothing.
    """
    f32 = jnp.float32

    def dense(w, b, h):
        y = jax.lax.dot_general(
            w, h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        return y + b

    x = x_ref[:]  # (8, TILE_N) f32; rows 0:3 are xyz, rest zero-padding
    xyz = x[0:3]

    # frequency encoding, row order matching DistilledField.encode_T exactly:
    # [xyz, sin(x*f0..f7, y*f0..f7, z*f0..f7), cos(same)]; frequencies are
    # python floats (pallas kernels cannot capture array constants)
    ang = jnp.concatenate(
        [xyz[i : i + 1] * float(2.0 ** k * jnp.pi)
         for i in range(3) for k in range(octaves)],
        axis=0,
    )  # (3*octaves, TILE_N)
    enc = jnp.concatenate([xyz, jnp.sin(ang), jnp.cos(ang)], axis=0)
    n_enc = 3 + 6 * octaves
    enc_pad = w1_ref.shape[1]
    if n_enc < enc_pad:
        enc = jnp.concatenate(
            [enc, jnp.zeros((enc_pad - n_enc, enc.shape[1]), f32)], axis=0
        )
    h = jnp.maximum(dense(w1_ref[:].astype(jnp.bfloat16),
                          b1_ref[:], enc.astype(jnp.bfloat16)), 0.0)
    for i in range(depth - 1):
        h = jnp.maximum(
            dense(wt_ref[i].astype(jnp.bfloat16), bt_ref[i],
                  h.astype(jnp.bfloat16)),
            0.0,
        )
    hd = dense(wh_ref[:].astype(jnp.bfloat16), bh_ref[:],
               h.astype(jnp.bfloat16))  # (16, TILE_N)
    # expm1 has no Mosaic lowering; exp-1 is fine (softplus output >= 0)
    sigma = jnp.exp(jax.nn.softplus(hd[0:1])) - 1.0  # (1, TILE_N)
    geo = hd[1:16]                                # (15, TILE_N)

    d = d_ref[:][0:3]
    sh = sh_encoding_deg4_T(d)                    # (16, TILE_N)
    cin = jnp.concatenate(
        [geo, sh, jnp.zeros((1, geo.shape[1]), f32)], axis=0
    )                                             # (32, TILE_N)
    c = jnp.maximum(dense(wc1_ref[:].astype(jnp.bfloat16), bc1_ref[:],
                          cin.astype(jnp.bfloat16)), 0.0)
    c = jnp.maximum(dense(wc2_ref[:].astype(jnp.bfloat16), bc2_ref[:],
                          c.astype(jnp.bfloat16)), 0.0)
    rgb_l = dense(wc3_ref[:].astype(jnp.bfloat16), bc3_ref[:],
                  c.astype(jnp.bfloat16))         # (8, TILE_N), rows 0:3 used
    rgb = jax.nn.sigmoid(rgb_l[0:3])

    out_ref[:] = jnp.concatenate(
        [sigma, rgb, jnp.zeros((4, sigma.shape[1]), f32)], axis=0
    )


# ray tile for the march kernel: rays per kernel invocation. Activations
# peak at (128, TILE_R) bf16 = 512 KB — comfortable in VMEM with the
# ~120 KB weight set and double-buffered (8, TILE_R) ray IO.
TILE_R = 2048


def _march_kernel(octaves, depth, S, min_trans, density_scale,
                  rays_ref,
                  w1_ref, b1_ref, wt_ref, bt_ref, wh_ref, bh_ref,
                  wc1_ref, bc1_ref, wc2_ref, bc2_ref, wc3_ref, bc3_ref,
                  out_ref):
    """One TILE_R-ray tile: stratified sampling -> MLP -> compositing, all
    in VMEM. ``rays_ref`` rows: o (0:3), d (3:6), t_near (6), t_far (7) in
    grid space (t in NeRF units); a miss ray is encoded as t_far <= t_near.

    Matches nerf.render._composite semantics exactly: midpoint stratified
    samples, last delta = t_far - t_last, transmittance cutoff at
    ``min_trans`` BEFORE the current sample's contribution, depth =
    weighted mean t where alpha > 1e-4.

    Out rows: alpha (0), rgb (1:4), depth (4), zero padding (5:8).
    """
    f32 = jnp.float32

    def dense(w, b, h):
        y = jax.lax.dot_general(
            w, h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        return y + b

    rays = rays_ref[:]                       # (8, TILE_R) f32
    o = rays[0:3]
    d = rays[3:6]
    t_near = rays[6:7]
    t_far = rays[7:8]
    valid = (t_far > t_near).astype(f32)     # (1, TILE_R)
    dt = jnp.maximum(t_far - t_near, 0.0) / float(S)
    dn = d / jnp.maximum(
        jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True)), 1e-9
    )
    sh = sh_encoding_deg4_T(dn)              # (16, TILE_R) — ONCE per ray

    n_enc = 3 + 6 * octaves
    enc_pad = w1_ref.shape[1]

    def mlp(xyz):
        """(3, TILE_R) positions -> (sigma (1, R), rgb (3, R))."""
        ang = jnp.concatenate(
            [xyz[i : i + 1] * float(2.0 ** k * jnp.pi)
             for i in range(3) for k in range(octaves)],
            axis=0,
        )
        enc = jnp.concatenate([xyz, jnp.sin(ang), jnp.cos(ang)], axis=0)
        if n_enc < enc_pad:
            enc = jnp.concatenate(
                [enc, jnp.zeros((enc_pad - n_enc, enc.shape[1]), f32)],
                axis=0,
            )
        h = jnp.maximum(dense(w1_ref[:].astype(jnp.bfloat16),
                              b1_ref[:], enc.astype(jnp.bfloat16)), 0.0)
        for i in range(depth - 1):
            h = jnp.maximum(
                dense(wt_ref[i].astype(jnp.bfloat16), bt_ref[i],
                      h.astype(jnp.bfloat16)),
                0.0,
            )
        hd = dense(wh_ref[:].astype(jnp.bfloat16), bh_ref[:],
                   h.astype(jnp.bfloat16))
        sigma = jnp.exp(jax.nn.softplus(hd[0:1])) - 1.0
        geo = hd[1:16]
        cin = jnp.concatenate(
            [geo, sh, jnp.zeros((1, geo.shape[1]), f32)], axis=0
        )
        c = jnp.maximum(dense(wc1_ref[:].astype(jnp.bfloat16), bc1_ref[:],
                              cin.astype(jnp.bfloat16)), 0.0)
        c = jnp.maximum(dense(wc2_ref[:].astype(jnp.bfloat16), bc2_ref[:],
                              c.astype(jnp.bfloat16)), 0.0)
        rgb_l = dense(wc3_ref[:].astype(jnp.bfloat16), bc3_ref[:],
                      c.astype(jnp.bfloat16))
        return sigma, jax.nn.sigmoid(rgb_l[0:3])

    def body(s, carry):
        trans, rgb_acc, acc, dep = carry
        t = t_near + (s.astype(f32) + 0.5) * dt            # (1, TILE_R)
        x = jnp.clip(o + t * d, 0.0, 1.0)
        sigma, rgb = mlp(x)
        delta = jnp.where(s == S - 1, 0.5 * dt, dt)
        a = 1.0 - jnp.exp(-sigma * density_scale * delta)
        w = a * trans
        w = jnp.where(trans > min_trans, w, 0.0) * valid
        return (
            trans * (1.0 - a + 1e-10),
            rgb_acc + w * rgb,
            acc + w,
            dep + w * t,
        )

    R = o.shape[1]
    init = (
        jnp.ones((1, R), f32),
        jnp.zeros((3, R), f32),
        jnp.zeros((1, R), f32),
        jnp.zeros((1, R), f32),
    )
    _, rgb_acc, acc, dep = jax.lax.fori_loop(0, S, body, init)
    depth_out = jnp.where(acc > 1e-4, dep / jnp.maximum(acc, 1e-8), 0.0)
    out_ref[:] = jnp.concatenate(
        [acc, rgb_acc, depth_out, jnp.zeros((3, R), f32)], axis=0
    )


def _pad_rows(a, rows):
    return jnp.concatenate(
        [a, jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)], axis=0
    ) if a.shape[0] < rows else a


def _pad_cols(a, cols):
    return jnp.concatenate(
        [a, jnp.zeros(a.shape[:1] + (cols - a.shape[1],), a.dtype)], axis=1
    ) if a.shape[1] < cols else a


def fused_distilled_eval(field, xT: jax.Array, dT: jax.Array,
                         interpret: bool | None = None):
    """Evaluate a DistilledField at positions xT (3, N), directions dT (3, N).

    Returns (sigma (N,), rgbT (3, N)) — identical contract to
    ``DistilledField.field_T`` but through the fused Pallas kernel.
    N is padded internally to a multiple of TILE_N.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    octaves, depth, enc_pad, weights = _prep_weights(field)

    n = xT.shape[1]
    n_pad = -(-n // TILE_N) * TILE_N
    xp = _pad_cols(xT.astype(jnp.float32), n_pad)
    dp = _pad_cols(dT.astype(jnp.float32), n_pad)
    xp = _pad_rows(xp, 8)
    dp = _pad_rows(dp, 8)

    grid = (n_pad // TILE_N,)
    tile_spec = lambda r: pl.BlockSpec(  # noqa: E731
        (r, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_fused_kernel, octaves, depth),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        grid=grid,
        in_specs=[tile_spec(8), tile_spec(8)] + [full()] * 12,
        out_specs=tile_spec(8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (128 * enc_pad + (depth - 1) * 128 * 128
                               + 16 * 128 + 64 * 32 + 64 * 64 + 8 * 64),
            bytes_accessed=(xp.size + dp.size + 8 * n_pad) * 4,
            transcendentals=n_pad * (6 * octaves + 8),
        ),
    )(xp, dp, *weights)

    return out[0, :n], out[1:4, :n]


def _prep_weights(field):
    """Pad/stack a DistilledField's weights for the pallas kernels."""
    octaves = field.octaves
    depth = len(field.trunk)
    width = field.trunk[0]["kernel"].shape[0]
    assert width == 128 and field.head["kernel"].shape[0] == 16, (
        "fused kernel is specialized to the production shape (128-wide trunk,"
        " 1+15 head)")
    enc_pad = -(-(3 + 6 * octaves) // 8) * 8
    w1 = _pad_cols(field.trunk[0]["kernel"], enc_pad)
    b1 = field.trunk[0]["bias"]
    wt = jnp.stack([p["kernel"] for p in field.trunk[1:]], axis=0)
    bt = jnp.stack([p["bias"] for p in field.trunk[1:]], axis=0)
    wh = field.head["kernel"]
    bh = field.head["bias"]
    wc1 = _pad_cols(field.color[0]["kernel"], 32)
    bc1 = field.color[0]["bias"]
    wc2 = field.color[1]["kernel"]
    bc2 = field.color[1]["bias"]
    wc3 = _pad_rows(field.color[2]["kernel"], 8)
    bc3 = _pad_rows(field.color[2]["bias"], 8)
    return (octaves, depth, enc_pad,
            (w1, b1, wt, bt, wh, bh, wc1, bc1, wc2, bc2, wc3, bc3))


def fused_march_render(
    field,
    o_g: jax.Array,      # (R, 3) grid-space origins
    d_g: jax.Array,      # (R, 3) grid-space dirs (t stays in NeRF units)
    t_near: jax.Array,   # (R,)
    t_far: jax.Array,    # (R,) — miss rays encoded as t_far <= t_near
    n_samples: int,
    min_transmittance: float,
    density_scale: float = 1.0,
    interpret: bool | None = None,
):
    """Whole-ray fused render: stratified sampling + MLP + compositing in
    ONE Pallas kernel, with per-RAY HBM IO only (10 floats in, 5 out).

    The three-dispatch path (sample positions -> fused MLP -> XLA composite)
    moves ~1.9 KB/ray of intermediates through HBM at 48 samples and runs at
    ~150 Msamp/s inside the tracker's frame program; this kernel keeps every
    per-sample tensor in VMEM (~30x less HBM traffic) and evaluates the SH
    direction encoding once per ray instead of once per sample. Replaces the
    render half of instant-ngp's fully-fused CUDA ray march
    (reference instant-ngp testbed.render, ingp_utils.py:22-44) with
    identical compositing semantics to nerf.render._composite.

    Returns dict(rgb (R, 3), alpha (R,), depth (R,)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    octaves, depth, enc_pad, weights = _prep_weights(field)

    R = o_g.shape[0]
    R_pad = -(-R // TILE_R) * TILE_R
    rays = jnp.concatenate(
        [
            o_g.T.astype(jnp.float32),
            d_g.T.astype(jnp.float32),
            t_near[None].astype(jnp.float32),
            t_far[None].astype(jnp.float32),
        ],
        axis=0,
    )  # (8, R)
    rays = _pad_cols(rays, R_pad)

    grid = (R_pad // TILE_R,)
    tile_spec = lambda r: pl.BlockSpec(  # noqa: E731
        (r, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    S = int(n_samples)
    out = pl.pallas_call(
        functools.partial(
            _march_kernel, octaves, depth, S,
            float(min_transmittance), float(density_scale),
        ),
        out_shape=jax.ShapeDtypeStruct((8, R_pad), jnp.float32),
        grid=grid,
        in_specs=[tile_spec(8)] + [full()] * 12,
        out_specs=tile_spec(8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * R_pad * S * (128 * enc_pad + (depth - 1) * 128 * 128
                                   + 16 * 128 + 64 * 32 + 64 * 64 + 8 * 64),
            bytes_accessed=(rays.size + 8 * R_pad) * 4,
            transcendentals=R_pad * S * (6 * octaves + 8),
        ),
    )(rays, *weights)

    return {
        "rgb": out[1:4, :R].T,
        "alpha": out[0, :R],
        "depth": out[4, :R],
    }
