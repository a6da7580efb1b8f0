"""Typed configuration for the framework.

The reference uses ``tf.app.flags``-style globals (SURVEY.md §3 row 1); here
every knob is a frozen dataclass so configs hash, compare, and feed cleanly
into ``jax.jit`` static arguments.  The five named presets are the five
benchmark configs from ``BASELINE.json`` (``configs`` field), reproduced in
BASELINE.md.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the generator / discriminator pair.

    Mirrors the reference capability set (SURVEY.md §1): a conv encoder,
    spatially-tiled action (and optionally end-effector state) conditioning at
    the bottleneck, a conv-transpose decoder with tanh output, and a
    strided-conv LeakyReLU discriminator.
    """

    image_size: int = 64
    image_channels: int = 3
    action_dim: int = 4
    # 3-dim end-effector state for joint state+action conditioning
    # (BASELINE.json config 4); 0 disables the state input entirely.
    state_dim: int = 0

    # Generator.
    g_base_channels: int = 64
    g_max_channels: int = 512
    # Number of stride-2 stages; bottleneck spatial = image_size / 2**levels.
    g_levels: int = 3
    # U-Net style encoder->decoder skip connections (off by default: the
    # reference genre is a plain encoder/decoder, SURVEY.md §4.1).
    skip_connections: bool = False

    # Discriminator.
    d_base_channels: int = 64
    d_max_channels: int = 512
    d_levels: int = 4
    # Extra stride-1 conv layers per level ("deeper discriminator",
    # BASELINE.json config 3).
    d_extra_layers: int = 0
    # Condition D on the input frame (pix2pix-style pair) and the tiled
    # action vector, not just the candidate next frame.
    d_condition_frame: bool = True
    d_condition_action: bool = True
    # Spectral normalization of EVERY D weight (convs + the logit head;
    # Miyato et al. 2018) — Lipschitz-constrains the discriminator.
    # STATELESS power iteration (models/common.spectral_normalize):
    # restarted deterministically each call with sn_iters iterations, so
    # the TrainState stays pure params (no mutable u vectors, no
    # checkpoint-layout change, resume-exact). Off by default (the
    # reference has no SN).
    d_spectral_norm: bool = False
    sn_iters: int = 9

    # Normalization: "group" (default; stateless and DP-exact), "batch"
    # (per-batch statistics, cross-device-synced via psum under data
    # parallelism — a deliberate, documented deviation from TF1 running-stats
    # BatchNorm, SURVEY.md §8 hard-part 3), or "none".
    norm: str = "group"
    group_norm_groups: int = 32
    leak: float = 0.2

    # Compute dtype for activations ("bfloat16" on TPU, "float32" for tests /
    # CPU parity oracle). Parameters and optimizer state are always float32.
    compute_dtype: str = "bfloat16"

    # Kernel backend: "xla" (lax.conv_general_dilated; always available,
    # correctness oracle) or "pallas" (fused Pallas TPU kernels).
    backend: str = "xla"

    # GroupNorm BACKWARD engine (independent of `backend`; the forward
    # always stays on the XLA path, whose conv+GN-stat fusions measure
    # near-roofline — docs/KERNELS.md r2):
    #   "ad"     — plain jax autodiff (the r2 default).
    #   "fused"  — closed-form gradient from saved (mean, rstd) residuals
    #              and the activation mask, in plain XLA ops (ops/gn.py).
    #   "pallas" — same math as ONE Pallas program per sample
    #              (ops/pallas/gn_bwd.py), XLA-"fused" fallback off the
    #              VMEM envelope.
    # Equivalence pinned by tests/test_gn_backward.py; perf measured in
    # BASELINE.md (VERDICT r2 lever 1c).
    gn_backward: str = "ad"

    # Weight-gradient engine for the convs (independent of `backend`;
    # forward unchanged):
    #   "xla"     — XLA AD's conv-shaped wgrad kernels (default).
    #   "patches" — dW as one im2col matmul over extracted patches
    #               (ops/wgrad.py; x-side patches for strided convs,
    #               dy-side for transpose convs) — targets the wgrad
    #               fusions the r3 xprof gap hunt measured at 1.4-2.0x
    #               their compute roofline.
    # dx and the forward are bit-identical either way; dw differs only by
    # f32-vs-bf16 accumulation order (tests/test_wgrad.py).
    wgrad: str = "xla"

    # Transposed-conv engine (independent of `backend`):
    #   "xla"      — lax.conv_transpose (input-dilated conv; default).
    #   "subpixel" — exact subpixel-phase rewrite: ONE 2x2 stride-1 conv to
    #                4*cout channels + depth-to-space (ops/xla.py
    #                conv2d_transpose_subpixel). Identical math (pinned
    #                fwd+grad, tests/test_deconv.py), minimal MACs, 4x the
    #                MXU output-lane fill — targets the 3-channel-output
    #                deconvs the r5 config3 xplane anatomy measured at
    #                2.4-44x their compute roofline (BASELINE.md). Plain AD
    #                (no custom VJP), so DP check_vma stays on. Falls back
    #                to "xla" off the k=4/stride-2/SAME envelope.
    deconv: str = "xla"

    # Engine for the LEVEL-0 (image-adjacent) strided convs — G enc_0 and
    # D conv_0, the ones contracting 3-10 image/conditioning channels
    # (independent of `backend`):
    #   "xla" — lax.conv_general_dilated as-is (default).
    #   "s2d" — exact space-to-depth rewrite: ONE stride-1 2x2 conv over the
    #           4*cin phase tensor (ops/xla.py conv2d_s2d). Identical math
    #           (pinned fwd+grad, tests/test_conv0.py) and MACs, 4x the
    #           input-channel fill — and the conv's DGRAD becomes a
    #           4*cin-channel-output conv instead of the 98%-lane-idle
    #           3-channel one. Targets the image-adjacent small-channel conv
    #           family the r5 config3 xplane anatomy measured at 2.4-44x
    #           compute roofline (36% of op-sum, BASELINE.md). Plain AD (no
    #           custom VJP), so DP check_vma stays on. Falls back to "xla"
    #           off the k=4/stride-2/SAME/even-spatial envelope.
    conv0: str = "xla"

    def __post_init__(self):
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.gn_backward not in ("ad", "fused", "pallas"):
            raise ValueError(f"unknown gn_backward engine {self.gn_backward!r}")
        if self.wgrad not in ("xla", "patches"):
            raise ValueError(f"unknown wgrad engine {self.wgrad!r}")
        if self.sn_iters < 1:
            # 0 would leave the power iteration's v unbound (opaque
            # NameError at trace time).
            raise ValueError(f"sn_iters must be >= 1, got {self.sn_iters}")
        if self.wgrad == "patches" and self.backend == "pallas":
            # The pallas conv carries its own custom VJP; accepting both
            # knobs would silently run pallas and A/B the wrong engine.
            raise ValueError(
                "wgrad='patches' is incompatible with backend='pallas'"
            )
        if self.deconv not in ("xla", "subpixel"):
            raise ValueError(f"unknown deconv engine {self.deconv!r}")
        if self.deconv == "subpixel" and self.backend == "pallas":
            # The pallas conv-transpose kernel already embeds the subpixel
            # decomposition; both knobs together would A/B the wrong engine.
            raise ValueError(
                "deconv='subpixel' is incompatible with backend='pallas'"
            )
        if self.deconv == "subpixel" and self.wgrad == "patches":
            # The patches transpose-wgrad engine acts on the original
            # transposed conv, which subpixel replaces with an ordinary conv.
            raise ValueError(
                "deconv='subpixel' is incompatible with wgrad='patches'"
            )
        if self.conv0 not in ("xla", "s2d"):
            raise ValueError(f"unknown conv0 engine {self.conv0!r}")
        if self.conv0 == "s2d" and self.backend == "pallas":
            # The pallas conv kernel acts on the original conv, which s2d
            # rewrites; both knobs together would A/B the wrong engine.
            raise ValueError("conv0='s2d' is incompatible with backend='pallas'")
        if self.conv0 == "s2d" and self.wgrad == "patches":
            # The patches wgrad engine acts on the original conv, which s2d
            # replaces with a different ordinary conv.
            raise ValueError("conv0='s2d' is incompatible with wgrad='patches'")

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def bottleneck_size(self) -> int:
        return self.image_size // (2**self.g_levels)

    @property
    def cond_dim(self) -> int:
        return self.action_dim + self.state_dim


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline configuration.

    ``source="synthetic"`` uses the seeded on-device pushing-clip generator
    (SURVEY.md §8 stage 2); ``source="tfrecord"`` reads BAIR-robot-pushing
    style TFRecords (per-timestep ``{t}/image_aux1/encoded``, ``{t}/action``,
    ``{t}/endeffector_pos`` features, SURVEY.md §1).
    """

    source: str = "synthetic"
    data_dir: Optional[str] = None
    # Held-out split for evaluate()/sample() on file sources. When unset,
    # eval reads data_dir — the TRAINING files — which is only honest for
    # quick smoke checks. Point this at a validation split so one config
    # trains on data_dir and evaluates on eval_data_dir (VERDICT r3 weak 3:
    # the reference evaluates on held-out (frame, action) pairs, SURVEY.md
    # §1 capability 6). Ignored by source="synthetic" (its held-out stream
    # is disjointly seeded instead).
    eval_data_dir: Optional[str] = None
    # Clip length for DIRECTLY-constructed readers (tests, tools). The
    # training pipeline derives its window length from
    # train.rollout_length + 1; make_dataset ignores this field.
    seq_len: int = 2
    # Clip-level shuffle buffer, applied by BOTH file readers (tf.data
    # shuffle() and the native reader's seeded buffer shuffle).
    shuffle_buffer: int = 256
    # BAIR TFRecord image feature key prefix ("image_aux1" or "image_main").
    tfrecord_image_key: str = "image_aux1"
    # Frame payload encoding in TFRecords: "raw" (H*W*3 bytes), "image"
    # (PNG/JPEG, any size — resized to raw_image_size), or "auto" (per-frame
    # length check; compressed frames resized).
    tfrecord_encoding: str = "auto"
    # Raw stored frame size before crop/resize (BAIR stores 64x64).
    raw_image_size: int = 64
    # Crop stage (SURVEY.md §1: "frame decode -> crop/resize -> normalize"):
    # square crop taken from the RAW frame before the resize, one offset per
    # clip. 0 disables (the BAIR 64x64-stored default, where crop is a
    # no-op). crop_random=False -> center crop; True -> per-clip random
    # offset, drawn statelessly from (seed, stream index) so both file
    # readers crop identically and crops survive resume fast-forward.
    crop: int = 0
    crop_random: bool = False
    # Timesteps stored per TFRecord clip (BAIR stores 30).
    clip_len: int = 30
    # Parallel clip decode for source="tfrecord_native": number of worker
    # threads parsing/decoding clips concurrently (the C parser and PIL
    # release the GIL). 0/1 = serial. Results are reassembled in exact
    # stream order, so batches are byte-identical to the serial reader —
    # shuffle, crop, and resume fast-forward semantics included. tf.data
    # has its own threadpool; this is the native reader's equivalent for
    # hosts where one decode core cannot feed the chips (BASELINE.md host
    # reader table).
    decode_threads: int = 0
    # Dtype the FRAME arrays are staged to the device in ("float32" or
    # "bfloat16"). The models cast inputs to model.compute_dtype at entry
    # anyway, so "bfloat16" only quantizes the pixels once at the input
    # boundary (loss targets included) — semantically: feeding
    # bf16(batch) to the float32 path. It halves the frame HBM footprint
    # and traffic of the stacked multi-step batch bank (r3 xprof: the
    # f32 bank's per-step dynamic-slice + one-time normalize pass cost
    # ~80 us/step at the headline k=128 geometry) and halves host->device
    # frame transfer for file sources. Actions/states stay float32.
    device_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Mesh / parallelism
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (SURVEY.md §3 parallelism table).

    The reference is single-device; all distribution here is new TPU-native
    design: DP over the ``data`` axis with psum gradient reduction, optional
    TP over the ``model`` axis (conv channel sharding via GSPMD). PP/SP/EP
    are deliberately N/A for this model family (no attention, no MoE, ~10
    conv layers) — the rollout "sequence" axis is handled by lax.scan, not
    sharding.
    """

    # -1 means "all available devices" on the data axis.
    data: int = -1
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # Global batch size (split across the data mesh axis).
    batch_size: int = 8
    total_steps: int = 100_000
    # Adam hyperparameters for the two separate optimizers (SURVEY.md §3
    # row 6: two AdamOptimizers over G / D variables).
    g_lr: float = 2e-4
    d_lr: float = 2e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    # Generator reconstruction loss: g_loss = adv + recon_weight * recon.
    recon_weight: float = 100.0
    recon_type: str = "l2"  # "l2" | "l1"
    # Adversarial loss family: "ce" (the reference's sigmoid cross-entropy,
    # softplus form) or "hinge" (Lim & Ye 2017 — the SN-GAN pairing:
    # D: relu(1∓logit) margins, G: -E[D(fake)]). Incompatible with
    # d_label_smooth (a CE concept; rejected at step build).
    gan_loss: str = "ce"
    # D updates per G update (reference alternates 1:1, SURVEY.md §4.1).
    disc_steps: int = 1
    # R1 gradient penalty on the discriminator (zero-centered GP at the
    # REAL transitions, Mescheder et al. 2018 genre): adds
    # (r1_weight/2)·E[‖∇_x D(x_real)‖²] to the D loss every D step,
    # conditioning inputs held fixed. 0 disables (the reference has none;
    # this is a standard GAN-stability regularizer). Costs one extra D
    # forward+backward per step and a second-order grad through it. The
    # d_r1 metric reports the unweighted penalty.
    r1_weight: float = 0.0
    # One-sided label smoothing for D's REAL targets (Salimans et al.
    # 2016): CE(D(real), 1-eps). Fake targets stay hard (smoothing them is
    # known to hurt). 0 = the reference's hard labels. Typical value 0.1.
    d_label_smooth: float = 0.0
    # Differentiable D-input augmentation (DiffAugment genre, Zhao et al.
    # 2020; train/augment.py): comma-list of "color", "translation",
    # "cutout" applied to BOTH real and fake D inputs, gradients flowing
    # through to G — the limited-data regularizer. The conditioning frame
    # gets the same per-sample transform as its paired next-frame;
    # reconstruction always uses the raw prediction. With r1_weight > 0
    # the penalty is evaluated at the AUGMENTED real points (D's actual
    # input manifold). "" = off (the reference trains un-augmented).
    d_augment: str = ""
    # Apply each Adam update over ONE flattened parameter vector
    # (optax.flatten) instead of ~50 per-tensor fusions. Elementwise math is
    # unchanged (near-bitwise updates, pinned by test). Measured NEUTRAL on
    # v5e at the 64px bench (xprof r2: the per-tensor fusions are already
    # bandwidth-bound inside the scanned while body, and flatten's
    # ravel/unravel copies offset the fusion win: 3.19 vs 3.17 ms/step), so
    # it defaults off; it may pay on models with many more small tensors.
    # Auto-disabled when the mesh has a model (TP) axis > 1, where optimizer
    # moments must shard like their parameters. Changes the checkpointed
    # optimizer-state layout.
    flatten_optimizer: bool = False
    # Storage dtype of BOTH Adam moments ("float32" | "bfloat16"). Adam is
    # pure HBM bandwidth (~0.73 ms of the 2.85 ms headline step,
    # BASELINE.md anatomy); bf16 moments halve their read+write traffic.
    # The update math still runs in f32 (moments are upcast in-register);
    # only the stored EMAs are rounded, so mu loses ~3 decimal digits and
    # nu updates below ~0.4% of its magnitude quantize away — training
    # quality must be validated per-model (r3 evidence run in BASELINE.md).
    # Changes the checkpointed optimizer-state dtypes (resume across a
    # dtype switch restores into the NEW dtype template).
    adam_moment_dtype: str = "float32"
    # Learning-rate schedule applied to BOTH optimizers (each scaled from
    # its own peak g_lr / d_lr). The reference genre trains at a fixed Adam
    # lr, so "constant" (with warmup_steps=0) is the default and keeps the
    # optimizer-state pytree bit-identical to a plain float lr; any other
    # setting tracks the step count inside the optimizer state (optax
    # schedule), which changes the checkpointed layout.
    #   "constant": lr = peak (after warmup)
    #   "linear":   lr decays linearly peak -> lr_end_factor*peak over
    #               lr_decay_steps (then holds)
    #   "cosine":   half-cosine peak -> lr_end_factor*peak over
    #               lr_decay_steps (then holds)
    lr_schedule: str = "constant"
    # Linear warmup 0 -> peak over this many steps (0 disables).
    warmup_steps: int = 0
    # Decay horizon for "linear"/"cosine", measured AFTER warmup;
    # 0 = total_steps - warmup_steps.
    lr_decay_steps: int = 0
    # Final lr as a fraction of peak for "linear"/"cosine".
    lr_end_factor: float = 0.0
    # Clip each optimizer's gradient to this global L2 norm BEFORE Adam
    # (optax.clip_by_global_norm; G and D clipped independently, matching
    # their disjoint flows). 0 disables — and keeps the optimizer-state
    # pytree identical to the unclipped layout; > 0 wraps the chain and
    # changes the checkpointed structure.
    grad_clip_norm: float = 0.0

    # Rollout training (BASELINE.json configs 2, 4, 5): number of
    # autoregressive prediction steps per example. 1 = single-step GAN.
    rollout_length: int = 1
    # Scheduled sampling (config 4): probability of feeding the model its own
    # prediction instead of ground truth decays linearly from
    # ss_start_prob at step 0 to ss_end_prob at ss_decay_steps.
    scheduled_sampling: bool = False
    ss_start_prob: float = 0.0
    ss_end_prob: float = 1.0
    ss_decay_steps: int = 50_000

    # Rematerialize each rollout scan step in the backward pass
    # (jax.checkpoint): trades recompute FLOPs for HBM; required at T=30 @
    # 256x256 (config 5).
    remat_rollout: bool = False
    # Teacher-forced rollouts (scheduled_sampling=False) have NO sequential
    # dependency between timesteps, so the training rollout folds (B, T)
    # into one (B*T) generator batch — T x better MXU feeding than the
    # autoregressive scan (VERDICT r1: configs 2/5 ran at ~10% utilization).
    # rollout_time_chunk bounds activation memory for long horizons: > 0
    # scans over chunks of that many timesteps, each folded to (B*chunk);
    # 0 folds all of T at once. Ignored when scheduled sampling is on.
    rollout_time_chunk: int = 0
    # Exponential moving average of the GENERATOR weights, updated after
    # every G step: ema = decay*ema + (1-decay)*params. 0 disables (the
    # reference has no EMA; this is a standard GAN-evaluation improvement —
    # sample/eval with --ema, infer with Predictor(use_ema=True)). Typical
    # value 0.999. Adds a g_ema tree to TrainState/checkpoints when on.
    ema_decay: float = 0.0
    # Discriminator microbatching: > 0 scans the D loss/grad (and G's loss
    # head) over chunks of that many folded (B*T) transitions with gradient
    # accumulation — exact per-sample-mean math (means of equal chunk means;
    # pinned by test), but D's peak activation memory drops to chunk/(B*T)
    # of the full folded batch. Unblocks single-chip 256^2 runs at the
    # config5 pod-global batch (the batch-32 XLA OOM is four ~3.75 GB conv
    # temps on the folded 1920-transition D batch). 0 = off (one full-batch
    # D forward; the default and the fastest when memory allows). Rounded
    # down to the largest divisor of B*T.
    disc_microbatch: int = 0
    # Train steps executed per device dispatch (lax.scan over the fused
    # step). Semantics are identical to k sequential steps; amortizes
    # per-dispatch runtime overhead (measured 2.9x throughput at k=4 on the
    # tunneled v5e). log/checkpoint/sample cadences snap to call boundaries.
    steps_per_call: int = 1
    # Unroll factor for the steps_per_call scan (lax.scan(unroll=N)). >1
    # duplicates the step body N times per loop iteration, widening XLA's
    # scheduling window across step boundaries (step i's optimizer update
    # can overlap step i+1's convs). Semantics identical; compile time and
    # program size grow with N. steps_per_call need not be divisible by it
    # (lax.scan runs the remainder steps in a partial final iteration).
    scan_unroll: int = 1
    # Debug config (SURVEY.md §6): surface NaNs at the op that produced them.
    debug_nans: bool = False
    # Add g_grad_norm / d_grad_norm (post-pmean, pre-clip global L2) to the
    # step metrics — the observability for tuning grad_clip_norm. Off by
    # default: the norms force a full param-tree reduction into the metrics
    # path every step.
    log_grad_norms: bool = False

    seed: int = 0
    log_every: int = 100
    checkpoint_every: int = 1000
    checkpoint_keep: int = 3
    sample_every: int = 1000


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "config1"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    workdir: str = "/tmp/acgan"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# The five BASELINE.json benchmark configs, verbatim mapping:
PRESETS = {
    # 1. "64x64 single-step next-frame GAN, batch 8, synthetic pushing-style
    #    clips + 4-dim action (CPU ref run)"
    "config1": Config(
        name="config1",
        model=ModelConfig(image_size=64, action_dim=4, g_levels=3, d_levels=4),
        data=DataConfig(source="synthetic", seq_len=2),
        # steps_per_call from the r3 batch-8 dispatch sweep (BASELINE.md):
        # k=16 0.695 ms/step -> k=64 0.529 -> k=128 0.498; 64 takes most of
        # the amortization win while keeping log/checkpoint granularity.
        train=TrainConfig(batch_size=8, rollout_length=1, steps_per_call=64),
    ),
    # 2. "64x64 multi-step rollout (T=10) with recurrent action-conditioned
    #    generator, batch 16"
    "config2": Config(
        name="config2",
        model=ModelConfig(image_size=64, action_dim=4, g_levels=3, d_levels=4),
        data=DataConfig(source="synthetic", seq_len=11),
        train=TrainConfig(batch_size=16, rollout_length=10, steps_per_call=32),
    ),
    # 3. "128x128 frames, deeper discriminator, batch 32 data-parallel on
    #    v4-8"
    "config3": Config(
        name="config3",
        model=ModelConfig(
            image_size=128, action_dim=4, g_levels=4, d_levels=5, d_extra_layers=1
        ),
        data=DataConfig(source="synthetic", seq_len=2),
        train=TrainConfig(batch_size=32, rollout_length=1, steps_per_call=32),
        mesh=MeshConfig(data=-1, model=1),
    ),
    # 4. "State+action joint conditioning with scheduled-sampling rollouts,
    #    batch 64"
    "config4": Config(
        name="config4",
        model=ModelConfig(image_size=64, action_dim=4, state_dim=3, g_levels=3, d_levels=4),
        data=DataConfig(source="synthetic", seq_len=11),
        train=TrainConfig(
            batch_size=64,
            rollout_length=10,
            steps_per_call=16,
            scheduled_sampling=True,
            ss_start_prob=0.0,
            ss_end_prob=1.0,
            ss_decay_steps=50_000,
        ),
        mesh=MeshConfig(data=-1, model=1),
    ),
    # 5. "256x256 long-horizon (T=30) rollouts, data-parallel across a
    #    v5e-16 pod"
    "config5": Config(
        name="config5",
        model=ModelConfig(
            image_size=256, action_dim=4, g_levels=5, d_levels=6, d_extra_layers=1
        ),
        data=DataConfig(source="synthetic", seq_len=31),
        train=TrainConfig(
            batch_size=32,
            rollout_length=30,
            remat_rollout=True,
            steps_per_call=4,
            # Fold 2 timesteps per chunk: (64, 256, 256, 3) G batches keep
            # peak activation memory ~2 GB under remat while doubling the
            # scan's MXU feeding (full T=30 fold would need ~30 GB).
            rollout_time_chunk=2,
        ),
        mesh=MeshConfig(data=-1, model=1),
    ),
}


def get_preset(name: str, **overrides) -> Config:
    """Return a named BASELINE.json preset, optionally with field overrides."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    cfg = PRESETS[name]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
