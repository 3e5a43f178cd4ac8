"""Static render/trace configuration.

The reference has no runtime config at all -- resolution, spp and bounce
budgets are compile-time constants (main.cxx:22-37, cuda_impl.cu:59-60,
raytracer.hxx:20; SURVEY #25). Here the equivalents are explicit, hashable
dataclasses passed as *static* jit arguments, so each configuration traces
to its own specialized XLA program (the TPU analogue of the reference's
template/constexpr specialization).

``TraceOptions`` also carries the quirk-compat switches (SURVEY section 7
"quirk policy"): defaults are the *corrected* physics; the reference's exact
behaviors are reproducible for validation via the presets below.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TraceOptions:
    """Semantics switches for the integrator (all static).

    SUPPORTED-COMBINATION MATRIX (the one place; engine guards raise on
    the unsupported cells):

      mega:        "fused" (default) | "off" | "bounce"
      rr_terminate: fused ok | off ok | bounce RAISES (ablation kernel)
      hit_kernel:  "sorted"/"mxu" apply under fused/off; under "bounce"
                   "sorted" RAISES and "mxu" is ignored (the megakernel
                   does its own intersect)
      ownership:   "tile" requires mega in (fused, off); RAISES on bounce
      dual-pool engine (ops/wavefront_dual.py): rr_terminate supported
                   (same draws as the single pool, images agree to
                   accumulation order); ownership/hit_kernel="sorted"
                   are ignored (it has its own cone-cull list path)
      deposit:     "ledger"/"scatter" valid for every combination above
      planar AD engines (integrate_planar.render_pixels_planar and the
                   regenerative ops/wavefront_ad.py): honor rr_terminate
                   with the SAME (TAG_BOUNCE + b, counter 2) draw as the
                   forward engines; survival q and the 1/q boost are
                   stop-gradiented, so gradients are RR applied to the
                   gradient integrand (unbiased; FD-validated in
                   tests/test_wavefront_ad.py). In the regenerative
                   engine the killed lane regenerates, so the segment
                   saving is real forward AND backward; the fixed-depth
                   scan implements it for estimator parity only (fixed
                   trip count -- no time saved).
      tiled AD engine (render.render_pixels / ops/integrate.trace): uses
                   options.intersect + gather only; the wavefront-only
                   switches (mega, hit_kernel, ownership, rr_*) are
                   ignored there -- it keeps the reference-faithful
                   estimator.
    """

    # Minimum hit distance epsilon (raytracer.hxx:98; cuda_impl.cu:176).
    t_min: float = 0.008
    # Random vector used by lambert/metal scatter: "unit" = normalized
    # (CUDA, cuda_impl.cu:206/220, true Lambertian) or "ball" = unnormalized
    # point in the unit sphere (CPU, raytracer.hxx:134/147; quirk Q3).
    scatter_sample: str = "unit"
    # Sky gradient parameter: "cuda" = .5*y+.5 (cuda_impl.cu:293, correct)
    # or "cpu" = .5*y+1 (main.cxx:71; quirk Q6, can overflow u8).
    sky: str = "cuda"
    # Refraction formula: "physical" (standard Snell) or "reference"
    # (math.hxx:304-308 scalar-broadcast expression; see ops/math3.py).
    refract: str = "physical"
    # Sphere-block size for the streamed closest-hit reduction.
    sphere_block: int = 512
    # Closest-hit implementation for forward-only traces: "jnp" (XLA-fused
    # broadcast+argmin) or "pallas" (fused VMEM kernel,
    # ops/pallas_intersect.py). The differentiable integrator always uses
    # "jnp" (the Pallas kernel is forward-only).
    intersect: str = "jnp"
    # Per-ray sphere/material parameter fetch in the jnp integrator:
    # "onehot" = exact one-hot matmul on the MXU (differentiable; its
    # transpose is another matmul), "take" = plain index gathers
    # (measured ~80ns/element on v5e -- serialized).
    gather: str = "onehot"
    # Wavefront engine fusion level (all three measured on v5e, see
    # ARCHITECTURE.md):
    #   "fused"  = closest-hit kernel + XLA MXU one-hot resolve + ONE
    #              shade/state/regen Pallas program (ops/pallas_fused.py,
    #              rotated loop body);
    #   "bounce" = whole bounce incl. in-kernel param resolve in one
    #              Pallas program (ops/pallas_mega.py; measured -6%: the
    #              per-row resolve matmuls serialize against the VPU);
    #   "off"    = closest-hit kernel with XLA fusions around it.
    mega: str = "fused"
    # Closest-hit kernel LAYOUT in the wavefront engines (all Pallas,
    # ops/pallas_segment.py): "sublane" = rays on (rows,128) planes,
    # per-sphere SMEM scalar loop (the round-1/2 kernel); "mxu" =
    # sphere-MINOR layout (rays on sublanes, spheres on lanes) with the
    # two per-candidate dot products as small MXU matmuls (same
    # semantics up to f32 rounding on knife-edge candidates -- the dots
    # are algebraically regrouped); "sorted" = the sublane loop in
    # per-block distance order with whole-block early exit (the TPU
    # analogue of the reference's shrinking t_max, cuda_impl.cu:183-188
    # -- exact: conservative bounds, identical winners up to argmin
    # ties between exactly-equal f32 t).
    hit_kernel: str = "sublane"
    # hit_kernel="sorted" tuning: kernel block rows for the closest-hit
    # call only (0 = the engine's block rows; smaller blocks sharpen the
    # whole-block exit consensus at ~1us/program more grid overhead),
    # and the exit-check ladder: 8-sphere-chunk checkpoints at which the
    # staged loop may stop (() = never check -- the pure-overhead
    # ablation).
    sorted_rows: int = 0
    sorted_ladder: tuple = (4,)  # measured best on v5e (ARCHITECTURE.md)
    # Winning-sphere parameter resolve in the fused wavefront path:
    # "onehot" = one (N, S) bf16 one-hot MXU matmul (default); "split" =
    # factorized lo-matmul + hi-select (pallas_segment.
    # resolve_params_split; bit-exact); "f32" = the one-hot kept in f32
    # (drops the pred->bf16 convert; bit-exact). Measured (v5e,
    # ARCHITECTURE.md "Resolve phase closure"): split LOSES in-engine
    # (53.1 vs 58.2 Mrays/s -- the (N, hi*16) intermediate materializes
    # ~16 MB/iter), f32 is noise-level (1.0009x); the resolve cost is
    # ~73% one-hot CONSTRUCTION at the VPU compare floor, so both stay
    # documented ablations.
    resolve: str = "onehot"
    # Pixel-jitter sampling: "iid" (reference-faithful, the parity
    # default) or "stratified" (opt-in estimator change: the TAG_JITTER
    # words are remapped so u is exactly stratified over the spp strata
    # and v rides a van-der-Corput sequence under a full-range rotation
    # -- unbiased, lower pixel-antialiasing variance; ops/rng.py
    # stratify_uv). Round 4 extends the same rotated-stratified/vdc
    # scheme to the thin-lens pair (rng.stratify_lens_uv, thinlens
    # mode; rotations at the unconsumed (pid,0) TAG_LENS j=2 counter)
    # and to the FIRST-BOUNCE scatter pair (rng.strat0_scatter /
    # planar.strat0_scatter_planes; rotations at (pid,0) TAG_BOUNCE+0
    # j=3). Measured variance vs iid at 16 spp: 0.39x pinhole, 0.63x
    # cover, 0.44x wide-aperture, at a 5.4% TPU headline cost
    # (docs/STRAT_FULL_r04.json). Deeper bounces and the "cpu" quirk
    # lens stay iid; mega="bounce" cannot honor the bounce-0 half and
    # refuses the combination.
    sampling: str = "iid"
    # Wavefront task OWNERSHIP layout:
    #   "strided" = lane l owns global tasks l, l+P, ... (row-major
    #     pixels): perfect load balance, but a kernel block's in-flight
    #     rays span a full-width image row -- no origin coherence.
    #   "tile" = tasks run over a 32x32-pixel tile swizzle and each
    #     closest-hit kernel BLOCK owns a contiguous tile-order range
    #     (strided within the block): a block's rays form a compact
    #     frustum beam all frame (what hit_kernel="sorted" needs to
    #     fire), traded against block-level drain imbalance (cheap:
    #     drained blocks skip both Pallas kernels).
    ownership: str = "strided"
    # Russian-roulette PATH TERMINATION in the wavefront engines and the
    # planar AD engines (opt-in ESTIMATOR change; the reference never
    # terminates early).
    # After a ray has completed >= rr_start bounces it survives each
    # further bounce with q = clamp(max-channel(attenuation), rr_qmin, 1)
    # and survivors are boosted by 1/q -- unbiased in expectation, same
    # image mean at slightly higher variance, fewer traced segments.
    # Draw: one extra threefry block per bounce at (TAG_BOUNCE + b,
    # counter 2) -- existing draws are untouched, so rr_terminate=False
    # is bit-identical to the historical contract.
    rr_terminate: bool = False
    rr_start: int = 3
    rr_qmin: float = 0.05
    # Survival probability q = clip(rr_scale * max-channel(attenuation),
    # rr_qmin, 1): rr_scale > 1 kills less aggressively -- smaller speed
    # gain, much smaller variance inflation. The default (3, 4.0) is
    # tuned for VARIANCE x TIME efficiency, not raw rays/s: measured
    # eff 1.27x vs rr-off at +1.2% variance, where the raw-speed-optimal
    # (1, scale 1) reaches 79.8 Mrays/s but at 2.97x variance --
    # eff 0.41, a net LOSS (ARCHITECTURE.md "Russian-roulette",
    # docs/RR_EFFICIENCY_r03.jsonl).
    rr_scale: float = 4.0

    def __post_init__(self):
        # Real raises (not asserts): these also validate strings arriving
        # from untrusted sources (the render server forwards request
        # options straight into TraceOptions, serve.py), and asserts
        # vanish under `python -O`.
        def _choice(name, value, allowed):
            if value not in allowed:
                raise ValueError(
                    f"TraceOptions.{name}={value!r}; must be one of "
                    f"{allowed}")

        _choice("scatter_sample", self.scatter_sample, ("unit", "ball"))
        _choice("sky", self.sky, ("cuda", "cpu"))
        _choice("refract", self.refract, ("physical", "reference"))
        _choice("intersect", self.intersect, ("jnp", "pallas"))
        _choice("mega", self.mega, ("off", "bounce", "fused"))
        _choice("hit_kernel", self.hit_kernel, ("sublane", "mxu", "sorted"))
        _choice("gather", self.gather, ("onehot", "take"))
        _choice("resolve", self.resolve, ("onehot", "split", "f32"))
        _choice("ownership", self.ownership, ("strided", "tile"))
        _choice("sampling", self.sampling, ("iid", "stratified"))
        if not (self.rr_start >= 1 and 0.0 < self.rr_qmin <= 1.0
                and self.rr_scale > 0.0):
            raise ValueError(
                f"bad rr knobs: rr_start={self.rr_start} "
                f"rr_qmin={self.rr_qmin} rr_scale={self.rr_scale}")
        if self.sorted_rows < 0 or not all(
                int(c) > 0 for c in self.sorted_ladder):
            raise ValueError(
                f"bad sorted knobs: sorted_rows={self.sorted_rows} "
                f"sorted_ladder={self.sorted_ladder}")
        if self.sampling == "stratified" and self.mega == "bounce":
            # The whole-bounce ablation kernel's state carries no
            # task/sid planes, so it cannot honor the first-bounce half
            # of the stratified estimator (planar.strat0_scatter_planes)
            # -- refusing beats silently rendering a different image
            # than every other engine. (Same carve-out class as the
            # kernel's other exclusions; ARCHITECTURE.md.)
            raise ValueError(
                "sampling='stratified' is not supported with "
                "mega='bounce' (the whole-bounce ablation kernel has no "
                "task/sid state for the first-bounce stratification); "
                "use mega='fused' or 'off'")


# The semantics of the reference's ACTIVE renderer (the CUDA path).
REFERENCE_CUDA = TraceOptions(scatter_sample="unit", sky="cuda",
                              refract="reference")
# The semantics of the reference's dead CPU renderer.
REFERENCE_CPU = TraceOptions(scatter_sample="ball", sky="cpu",
                             refract="reference")
# Corrected physics (framework default).
DEFAULT = TraceOptions()


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """A full render job (the analogue of app::data + cuda::data constants).

    width/height: main.cxx:25-31; spp: main.cxx:23 (16, CPU) and
    cuda_impl.cu:59 (48, CUDA); max_depth: raytracer.hxx:20 (64, CPU) and
    cuda_impl.cu:60 (32, CUDA).
    """

    width: int = 1920
    height: int = 1080
    spp: int = 48
    max_depth: int = 32
    camera_mode: str = "thinlens"  # see models/camera.py
    options: TraceOptions = DEFAULT
    # Upper bound on rays traced per device program invocation; pixels x spp
    # are tiled to stay under this (HBM working-set control).
    rays_per_chunk: int = 1 << 20
