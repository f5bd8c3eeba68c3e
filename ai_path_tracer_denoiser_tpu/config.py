"""Runtime configuration.

The reference scatters its knobs across compile-time ``#define``s
(pathtrace.cu:20-28, interactions.h:4-6, main.cpp:39-42, scene.cpp:9,
preview.cpp:7).  Here every flag is a runtime field on two frozen
dataclasses so a single binary serves every configuration; they are
hashable so they can be passed as static args to ``jax.jit``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Knobs of the path tracer (reference: pathtrace.cu:20-28, interactions.h:4-6).

    All fields are static under jit; changing one triggers a recompile,
    exactly like flipping a ``#define`` triggered a rebuild in the reference.
    """

    # --- optimizations (pathtrace.cu:20-23) ---
    # Mask-based equivalent of thrust::partition stream compaction: the bounce
    # loop exits early once every lane is dead (lax.while_loop over bounces).
    stream_compaction: bool = True
    # Sort paths by material id before shading (pathtrace.cu:508-510). On TPU
    # shading is branch-free/vectorized so this is off by default, as in the
    # reference (SORT_MATERIAL false); kept for parity + benchmarking.
    sort_material: bool = False
    # Reuse the depth-0 intersections of iteration 1 (pathtrace.cu:22, 466-476).
    cache_first_bounce: bool = False
    # Gate per-ray triangle loops on a ray/AABB test (pathtrace.cu:23, 258).
    ray_culling: bool = True
    # Route meshes that carry a cluster hierarchy (ops/bvh.py) through the
    # Pallas BVH kernel (render/mesh_kernel.py) instead of the O(F) scan.
    # Ignored for differentiable renders (the kernel has no VJP) and for
    # meshes loaded without a hierarchy.
    mesh_bvh: bool = True
    # Sort secondary rays by direction octant before the BVH kernel so each
    # ray tile descends a coherent node set (pure permutation round-trip —
    # bitwise-identical images).  Costs two argsorts/bounce, negligible
    # against any BVH-scale mesh; measured on hardware (r4,
    # tools/hw_statue_tuning.py): 81,920-face statue 6,560 -> 3,419
    # ms/frame at depth 8.  Applies to secondary bounces only.
    mesh_octant_sort: bool = True
    # Rays per BVH-kernel grid program for SECONDARY bounces — the
    # descent-gating granule (a node is visited when ANY ray in the
    # program's tile wants it).  1024 packs 8 native lane rows per program
    # (best DMA amortization); 128 gates at single-row granularity so
    # incoherent secondary bounces skip ~8x more of the tree (pair with
    # mesh_octant_sort so each small tile holds direction-coherent rays).
    # Primary rays (depth 0) always use the coherent-optimal 1024.
    # Bitwise-identical results either way (pure work partitioning).
    mesh_kernel_lanes: int = 1024
    # With mesh_octant_sort, additionally sort secondary rays by an
    # origin-cell Morton MAJOR key (mesh_sort_cells^3 cells over the ray
    # batch's own origin bounds): subtiles then share position AND
    # direction, shrinking the node set each one descends.  0 = octant
    # only.  Bitwise-identical results (pure permutation).
    mesh_sort_cells: int = 8
    # BVH traversal kernel: "v2" = index-order descent, tile-wide gating
    # (render/mesh_kernel.py); "v2p" = v2 traversal with batched sibling
    # liveness + 8-slot pipelined cluster DMA (render/mesh_kernel_v2p.py,
    # the measured-fastest default); "v3" = front-to-back sorted descent
    # with 128-ray subtile gating (render/mesh_kernel_v3.py).  All
    # bitwise-identical results (each matches the dense scan exactly,
    # hardware-verified tools/hw_bvh_check.py); purely a traversal-work
    # choice.  Statue depth-8 matrix (r4, same-session contention-
    # comparable): v2+octant 3433 -> v2p+octant 3052 -> v2p+cell8 2601.
    mesh_kernel_impl: str = "auto"

    # --- effects (pathtrace.cu:25-28) ---
    antialias: bool = True            # sub-pixel jitter, pathtrace.cu:168-173
    motion_blur: bool = False         # moveGeom every 4th iter, pathtrace.cu:441-446
    denoise: bool = True              # fill + emit the 10-channel G-buffer
    # --- shading variants (interactions.h:4-6) ---
    mesh_normal_view: bool = False    # debug: replace material color by |normal|
    fresnels: bool = True             # Schlick reflect/refract path (default)
    dielectric: bool = False          # PBRT-style Fresnel dielectric path

    # --- G-buffer layout ---
    # The reference's G-buffer is horizontally flipped relative to the render
    # (pathtrace.cu:86, 297-299). True reproduces that; False emits the
    # unflipped, straightforward layout.
    flip_horizontal: bool = True

    # --- execution backend ---
    # "auto": whole-render Pallas megakernel on TPU when the scene/options
    #   are eligible (analytic geoms, no sort/cache/motion-blur), XLA
    #   wavefront otherwise.  "xla" forces the wavefront path; "pallas"
    #   forces the megakernel (interpreted off-TPU) and errors if ineligible.
    backend: str = "auto"
    # Max 1-spp iterations folded into one device dispatch (None = auto:
    # 64, or 4 for >512-face meshes whose frames run seconds each).
    iters_per_dispatch: Optional[int] = None
    # Megakernel scene specialization:
    # "baked": transforms/materials fold into the kernel as constants —
    #   fastest steady-state, but each distinct scene compiles its own
    #   kernel (~minutes on a cold cache).
    # "operand": only the geom *layout* (count + type sequence + material
    #   count) specializes the kernel; transforms and material values
    #   arrive as SMEM scalars, so scene streams sharing a layout
    #   (randomizer variants for datagen, interactive material/transform
    #   edits) reuse ONE compiled kernel.
    pallas_geometry: str = "baked"

    # --- RNG ---
    # "parity": utilhash-seeded minstd LCG reproducing the reference's
    #   (iter, index, depth) noise statistics (pathtrace.cu:52-56).
    # "fast": threefry counter RNG keyed on the same triple.
    rng: str = "parity"

    # --- numerics ---
    # Most ray math stays f32 (geometry needs it); the radiance accumulator
    # dtype is switchable: "float32" (default; required for 1000s of spp) or
    # "bfloat16" (halves the accumulator's HBM footprint; fine for the
    # 1-spp-per-frame interactive mode).  bfloat16 accumulation routes
    # through the XLA wavefront path (the megakernel carries f32 tiles).
    accum_dtype: str = "float32"

    def __post_init__(self):
        assert self.rng in ("parity", "fast"), self.rng
        assert self.accum_dtype in ("float32", "bfloat16"), self.accum_dtype
        assert self.backend in ("auto", "xla", "pallas"), self.backend
        assert self.pallas_geometry in ("baked", "operand"), \
            self.pallas_geometry
        # Mirrors the asserts at pathtrace.cu:435-436.
        assert not (self.cache_first_bounce and self.antialias), (
            "first-bounce cache is incompatible with antialiasing")
        assert not (self.cache_first_bounce and self.motion_blur), (
            "first-bounce cache is incompatible with motion blur")


@dataclasses.dataclass(frozen=True)
class TrainOptions:
    """Training hyper-parameters (reference: train.py:41-49, 77, 86)."""

    lr: float = 1e-3
    # StepLR(step_size=25, gamma=0.2), train.py:42
    lr_step_epochs: int = 25
    lr_gamma: float = 0.2
    epochs: int = 100
    sequence_length: int = 7
    crop_size: int = 256
    batch_size: int = 1                 # sequences per step per device
    checkpoint_every_epochs: int = 3    # train.py:108
    # Loss weights: (0.8+w_j)*ls + (0.1+w_j)*lg + (0.1+w_j)*lt with the
    # Gaussian ramp w_j below (train.py:77, 86).
    w_spatial: float = 0.8
    w_gradient: float = 0.1
    w_temporal: float = 0.1
    # val_j ramp, train.py:77
    frame_ramp: Tuple[float, ...] = (0.011, 0.044, 0.135, 0.325, 0.607, 0.882, 1.0)
    seed: int = 0
    # bf16 conv compute with f32 params/accumulation (TPU MXU-friendly).
    bf16_compute: bool = True
    # jax.checkpoint each scanned frame: O(T)x less BPTT residual memory
    # for ~30% more backward FLOPs. Required for batch >= 4 at 256^2 on a
    # 16 GB chip; off at the reference's batch-1 config.
    remat_frames: bool = False


@dataclasses.dataclass(frozen=True)
class ModelOptions:
    """Denoiser architecture (reference: recurrent_autoencoder_model.py:93-117)."""

    in_channels: int = 10
    out_channels: int = 3
    # Encoder widths 10->32->43->57->76->101 (recurrent_autoencoder_model.py:98-107).
    # `tpu_friendly_channels` rounds these up to multiples of 8 lanes-friendly
    # sizes (32, 48, 64, 80, 104) for better MXU utilization; parity tests use
    # the exact reference plan.
    widths: Tuple[int, ...] = (32, 43, 57, 76, 101)
    leaky_slope: float = 0.1
    # "batch": BatchNorm with batch statistics (reference parity,
    #    cross-device stats via psum when data-parallel).
    # "group": GroupNorm(8) — recurrence/batch-1-friendly alternative
    #    (stateless; effective groups = gcd(8, C) so the reference's
    #    non-multiple-of-8 widths still normalize, models/layers.py).
    norm: str = "batch"
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    def __post_init__(self):
        assert self.norm in ("batch", "group"), self.norm

    @staticmethod
    def tpu_friendly() -> "ModelOptions":
        return ModelOptions(widths=(32, 48, 64, 80, 104))


DEFAULT_RENDER = RenderOptions()
DEFAULT_TRAIN = TrainOptions()
DEFAULT_MODEL = ModelOptions()
