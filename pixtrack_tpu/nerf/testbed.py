"""Testbed facade: the instant-ngp-shaped rendering interface.

Mirrors the 14-attribute pyngp surface the reference drives
(ingp_utils.initialize_ingp, reference pixtrack/utils/ingp_utils.py:22-44,
and get_nerf_image, run_vis_on_poses.py:28-57):

    testbed = Testbed(TestbedMode.Nerf)            # mode arg accepted
    testbed.load_snapshot(path)
    testbed.background_color = [r, g, b, a]
    testbed.snap_to_pixel_centers = True
    testbed.nerf.rendering_min_transmittance = 1e-7
    testbed.fov_axis = 0
    testbed.shall_train = False
    testbed.render_aabb.min / .max = [...]         # grid-space crop
    testbed.exposure = 0.0
    testbed.fov = <degrees>
    testbed.set_nerf_camera_matrix(m[:3, :])       # NeRF-space c2w
    testbed.render_mode = RenderMode.Shade | Depth
    img = testbed.render(w, h, spp, linear=True)   # (H, W, 4) float32

so tracker/visualization code written against the reference API drops in.
``spp`` maps to jittered re-renders averaged together (spp > 1) or a single
deterministic pass (spp == 1).
"""

from __future__ import annotations

import enum
from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.nerf.field import NGPField
from pixtrack_tpu.nerf.render import RenderConfig, render_image
from pixtrack_tpu.nerf.snapshot import load_snapshot


class RenderMode(enum.Enum):
    Shade = 0
    Depth = 1


class TestbedMode(enum.Enum):
    Nerf = 0


class _AABB:
    def __init__(self):
        self.min = [0.0, 0.0, 0.0]
        self.max = [1.0, 1.0, 1.0]


class Testbed:
    """Drop-in replacement for the pyngp Testbed surface used by pixtrack."""

    __test__ = False  # keep pytest from collecting this as a test class

    def __init__(self, mode: TestbedMode = TestbedMode.Nerf):
        self.mode = mode
        self.shall_train = False
        self.background_color = [1.0, 1.0, 1.0, 0.0]
        self.snap_to_pixel_centers = True
        self.fov_axis = 0
        self.exposure = 0.0
        self.render_mode = RenderMode.Shade
        self.render_aabb = _AABB()
        self.nerf = SimpleNamespace(
            sharpen=0.0,
            render_with_camera_distortion=False,
            rendering_min_transmittance=1e-7,
        )
        self._fov_deg = 50.0
        # Optional exact-intrinsics override (fx, fy, cx, cy) — an extension
        # over the pyngp surface so SfM cameras with off-center principal
        # points render exactly; None -> derive from fov like the reference.
        self.override_intrinsics = None
        self._camera = np.eye(4)
        self.field: Optional[NGPField] = None
        self.params = None
        self._baked = None
        self._render_cache = {}
        self.n_coarse = 64
        self.n_fine = 32
        # optional occupied-bounds ball (tighten_render_bounds): (4,) numpy
        self._sphere = None

    # -- snapshot ------------------------------------------------------------
    def load_snapshot(self, path, bake: bool = True) -> None:
        self.field, self.params, extra = load_snapshot(path)
        if "aabb" in extra:
            self.render_aabb.min = list(extra["aabb"][0])
            self.render_aabb.max = list(extra["aabb"][1])
        if bake:
            self.bake()

    def set_field(self, field: NGPField, params, bake: bool = False) -> None:
        self.field = field
        self.params = params
        self._baked = None
        self._render_cache.clear()
        if bake:
            self.bake()

    def set_baked_field(self, baked) -> None:
        """Install a prebuilt baked/distilled render field directly (e.g. a
        nerf.distill.load_distilled artifact), bypassing the vertex field."""
        self._baked = baked
        self._render_cache.clear()

    def bake(self) -> None:
        """Repack the vertex hash grid into the cell-packed render format
        (one gather per level, ~100x render throughput on TPU — see
        nerf/baked.py). Keeps the vertex field around for training."""
        from pixtrack_tpu.nerf.baked import bake as _bake

        self._baked = _bake(self.field, self.params)
        self._render_cache.clear()

    def distill(self, key=None, config=None, seed: int = 0,
                clean_floaters: bool = True, finetune_dataset=None,
                finetune_steps: int = 3000) -> None:
        """Replace the render field with an MXU-only distilled MLP
        (~10-30x the baked render throughput; see nerf/distill.py). Runs a
        few minutes of offline fitting against the current field.

        ``clean_floaters`` (default): clamp teacher density to zero outside
        the largest connected occupancy component, so disconnected floater
        blobs of a short-trained field are erased from the student instead
        of consuming its capacity (a no-op on clean single-component
        fields; see baked.main_component for the measured motivation).

        ``finetune_dataset``: optional NerfDataset (the NeRF training
        capture). When given, the point-distilled student is fine-tuned in
        RAY space against the captured pixels (distill.finetune_photometric)
        — on high-frequency textures this is the difference between a
        usable template and mush (mesh benchmark world: object-region
        PSNR 15.3 -> 22.7 dB, vs the hash teacher's 23.0)."""
        from pixtrack_tpu.nerf.baked import (
            main_component,
            occupancy_grid,
        )
        from pixtrack_tpu.nerf.distill import DistillConfig, distill as _distill

        teacher = self._baked if self._baked is not None else self.field
        tparams = None if self._baked is not None else self.params
        occ = occupancy_grid(teacher, tparams)
        mask = None
        if clean_floaters and occ.any():
            mask = main_component(occ)
            occ = occ & mask
        aabb = np.asarray([self.render_aabb.min, self.render_aabb.max],
                          np.float32)
        if key is None:
            key = jax.random.PRNGKey(seed)
        self._baked = _distill(teacher, tparams, key, aabb, occ=occ,
                               config=config or DistillConfig(),
                               density_mask=mask)
        if finetune_dataset is not None:
            from pixtrack_tpu.nerf.distill import finetune_photometric

            self._baked = finetune_photometric(
                self._baked, finetune_dataset, aabb, steps=finetune_steps,
                seed=seed + 1,
            )
        self._render_cache.clear()

    def tighten_render_bounds(
        self, res: int = 96, sigma_threshold: float = 0.01
    ) -> None:
        """Shrink render_aabb to the field's occupied box and install the
        occupied bounding ball for per-ray interval tightening (one-time
        res^3 density sweep; see nerf.render.occupied_bounds). The dropped
        interval is below the density threshold, so image-level fidelity is
        preserved while the fixed per-ray sample budget concentrates on the
        object (tests/test_fused_mlp.py pins this on the bench field).
        The sweep trusts the CURRENT render_aabb as the field's domain —
        a distilled MLP extrapolates arbitrary density outside its trained
        box, so this must not be called with a crop looser than the box the
        field was trained in."""
        from pixtrack_tpu.nerf.render import occupied_bounds

        fld = self._baked if self._baked is not None else self.field
        prm = None if self._baked is not None else self.params
        if fld is None:
            raise RuntimeError("no snapshot loaded")
        aabb = np.asarray(
            [self.render_aabb.min, self.render_aabb.max], np.float32
        )
        tight, sphere = occupied_bounds(
            fld, prm, aabb, res=res, sigma_threshold=sigma_threshold
        )
        self.render_aabb.min = [float(v) for v in tight[0]]
        self.render_aabb.max = [float(v) for v in tight[1]]
        self._sphere = sphere
        self._render_cache.clear()

    # -- camera --------------------------------------------------------------
    @property
    def fov(self) -> float:
        return self._fov_deg

    @fov.setter
    def fov(self, deg: float) -> None:
        self._fov_deg = float(deg)
        self._render_cache.clear()

    def set_nerf_camera_matrix(self, m) -> None:
        m = np.asarray(m, np.float64)
        cam = np.eye(4)
        cam[:3, :4] = m[:3, :4]
        self._camera = cam

    # -- rendering -----------------------------------------------------------
    def _intrinsics(self, width: int, height: int):
        if self.override_intrinsics is not None:
            return tuple(float(v) for v in self.override_intrinsics)
        half_angle = np.deg2rad(self._fov_deg) / 2.0
        if self.fov_axis == 0:
            f = (width / 2.0) / np.tan(half_angle)
        else:
            f = (height / 2.0) / np.tan(half_angle)
        # index-centered principal point at the image center
        return f, f, (width - 1) / 2.0, (height - 1) / 2.0

    def _renderer(self, width: int, height: int, spp: int):
        key = (width, height, spp, self.n_coarse, self.n_fine,
               float(self.nerf.rendering_min_transmittance),
               tuple(self.render_aabb.min), tuple(self.render_aabb.max),
               None if self._sphere is None else tuple(self._sphere.tolist()),
               None if self.override_intrinsics is None
               else tuple(float(v) for v in self.override_intrinsics))
        if key not in self._render_cache:
            fx, fy, cx, cy = self._intrinsics(width, height)
            cfg = RenderConfig(
                n_coarse=self.n_coarse,
                n_fine=self.n_fine,
                min_transmittance=float(self.nerf.rendering_min_transmittance),
                perturb=spp > 1,
            )
            aabb = jnp.asarray(
                [self.render_aabb.min, self.render_aabb.max], jnp.float32
            )
            snap = self.snap_to_pixel_centers
            baked = self._baked is not None
            static_field = self.field  # Flax module: static, closure-safe
            sphere = (
                None if self._sphere is None
                else jnp.asarray(self._sphere, jnp.float32)
            )

            # The field weights enter as a JIT ARGUMENT: the baked pytree
            # (cell tables would otherwise be embedded as 100s-of-MB
            # compile-time constants) or the vertex params.
            @jax.jit
            def run(field_arg, c2w, bg, rng_key):
                fld = field_arg if baked else static_field
                prm = None if baked else field_arg

                def one(k):
                    return render_image(
                        fld, prm, c2w, fx, fy, cx, cy, width, height,
                        aabb, cfg, background=(bg[0], bg[1], bg[2]),
                        key=k if spp > 1 else None,
                        snap_to_pixel_centers=snap,
                        sphere=sphere,
                    )

                if spp > 1:
                    # unrolled (not lax.map): scan blocks the VMEM staging of
                    # hash-table gathers — see render_image
                    keys = jax.random.split(rng_key, spp)
                    outs = [one(keys[i]) for i in range(spp)]
                    return jax.tree.map(
                        lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *outs
                    )
                return one(rng_key)

            self._render_cache[key] = run
        return self._render_cache[key]

    def render(
        self, width: int, height: int, spp: int = 1, linear: bool = True,
        seed: int = 0,
    ) -> np.ndarray:
        """Render (H, W, 4) float32. Depth mode returns depth in the RGB
        channels (NeRF-space units) with alpha, like the reference consumes
        (r9 get_mask thresholds channel 0; run_vis_on_poses.py:49-54)."""
        if self.field is None and self._baked is None:
            raise RuntimeError("no snapshot loaded")
        run = self._renderer(width, height, spp)
        bg = jnp.asarray(self.background_color[:3], jnp.float32)
        field_arg = self._baked if self._baked is not None else self.params
        out = run(field_arg, jnp.asarray(self._camera, jnp.float32), bg,
                  jax.random.PRNGKey(seed))
        rgba = np.asarray(out["rgba"])
        if self.render_mode == RenderMode.Depth:
            depth = np.asarray(out["depth"])
            rgba = np.concatenate(
                [np.repeat(depth[..., None], 3, axis=-1), rgba[..., 3:]], axis=-1
            )
        if not linear:
            rgba = rgba.copy()
            rgba[..., :3] = np.clip(rgba[..., :3], 0, 1) ** (1 / 2.2)
        if self.exposure:
            rgba[..., :3] = rgba[..., :3] * (2.0 ** self.exposure)
        return rgba.astype(np.float32)


def initialize_testbed(snapshot_path, aabb=None, background=None,
                       tighten: bool = False) -> Testbed:
    """First-party equivalent of the reference's initialize_ingp
    (ingp_utils.py:22-44): same defaults, our Testbed.

    ``tighten``: run the one-time occupied-bounds sweep so render rays only
    sample the object's occupied set (never changes output above the density
    threshold; concentrates the sample budget — see tighten_render_bounds).
    The production track path turns this on; it costs a res^3 density sweep
    (~seconds), so it defaults off for cheap/offline construction."""
    if background is None:
        background = [255, 255, 255, 0.0]
    tb = Testbed(TestbedMode.Nerf)
    tb.nerf.sharpen = 0.0
    tb.load_snapshot(snapshot_path)
    tb.nerf.render_with_camera_distortion = True
    tb.background_color = [c / 255.0 if c > 1 else c for c in background]
    tb.snap_to_pixel_centers = True
    tb.nerf.rendering_min_transmittance = 1e-7
    tb.fov_axis = 0
    tb.shall_train = False
    if aabb is not None:
        tb.render_aabb.min = list(aabb[0])
        tb.render_aabb.max = list(aabb[1])
    tb.exposure = 0.0
    if tighten:
        tb.tighten_render_bounds()
    return tb
