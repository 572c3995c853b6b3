"""Typed configuration system (component C1).

The reference expresses every experiment as a standalone script whose first ~60
lines are module-level hyperparameter constants (e.g. ``#%basic.py:20-64``,
``# final.py:27-70``, ``# 1,2,8.py:81-88``).  Here each experiment is a
:class:`ExperimentConfig` value; the :data:`PRESETS` registry provides one named
preset per reference script so that the whole 21-file family becomes data.

Nothing in this module touches JAX; configs are plain, hashable-ish dataclasses
that the trainer/strainer modules consume.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

# ---------------------------------------------------------------------------
# Data


@dataclass(frozen=True)
class SourceSpec:
    """One component of a (possibly contaminated) dataset mixture.

    ``name`` picks a dataset (see strainer_gan_tpu.data.datasets); ``count``
    limits how many samples to draw (None = all); ``fraction_of_primary``
    expresses the reference's "10% of CelebA size" style sizing
    (`# 상위 10% loss값...X.py:71-79`); ``class_filter`` restricts to given
    label classes (MNIST digit selection, `#8.py:33-36`, `# 1,2,8.py:42-55`).
    """

    name: str
    count: Optional[int] = None
    fraction_of_primary: Optional[float] = None
    class_filter: Optional[Tuple[int, ...]] = None
    class_fraction: Optional[float] = None  # e.g. 10% of all 1s (# 1,2,8.py:49-55)


@dataclass(frozen=True)
class DataConfig:
    """Mixture + input-pipeline config (components C2, C3).

    ``mixer`` selects the contamination-combination semantics:
      * ``"shuffled_combined"`` — `ShuffledCombinedDataset` (#z_score.py:98-114):
        pre-shuffled global index array over the concatenation.
      * ``"combined"`` — `CombinedDataset` (#strainer gan.py:122-137): plain
        concatenation; contaminant appended after primary.
      * ``"labeled"`` — `LabeledDataset` (# 상위 10%...X.py:71-110): concat with
        a per-sample source id carried alongside (the ground-truth oracle).
      * ``"concat"`` — torch ConcatDataset semantics (# 1,2,8.py:60-65).
    """

    sources: Tuple[SourceSpec, ...] = (SourceSpec("synthetic_faces"),)
    image_size: int = 64
    channels: int = 3
    batch_size: int = 128
    mixer: str = "shuffled_combined"
    flatten: bool = False  # MNIST MLP path reshapes to (N, 784) (`#8.py:117`)
    # torch DataLoader semantics per reference script: the MNIST loaders pass
    # drop_last=True (`#8.py:50`, `# 1,2,8.py:79`); every CelebA-family loader
    # keeps torch's default False (`#%basic.py:76`) and trains one exact
    # partial batch per epoch (lane-masked static-shape step; train/steps.py).
    # Field default True = the TPU-friendly static-shape choice for ad-hoc
    # configs; presets encode each script's actual semantics.
    drop_last: bool = True
    seed: int = 999
    # adaptive batch rule: batch = min(max(n // divisor, 16), 64)
    # (`#8.py:43` divisor 10; `Untitled-2.py:60` divisor 100); None = fixed
    auto_batch_divisor: "Optional[int]" = None


# ---------------------------------------------------------------------------
# Models


@dataclass(frozen=True)
class ModelConfig:
    """Generator/discriminator architecture (components C4-C6).

    ``arch``: ``"dcgan64"`` (#%basic.py:106-182) or ``"mlp"``
    (#8.py:62-95 plain; # 1,2,8.py:90-128 with bn/dropout).
    """

    arch: str = "dcgan64"
    nz: int = 100
    ngf: int = 64
    ndf: int = 64
    nc: int = 3
    # MLP (MNIST) family
    img_size: int = 784
    hidden: Tuple[int, ...] = (256, 512, 1024)
    g_batchnorm: bool = False  # `# 1,2,8.py:90-108`
    d_dropout: float = 0.0  # `# 1,2,8.py:110-128` uses 0.3
    # numerics
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Strain


@dataclass(frozen=True)
class StrainConfig:
    """Strainer stage config (components C7, C12-C21).

    ``method`` (scoring+threshold combos from §2 of SURVEY.md):
      * ``"none"`` — no straining (baselines).
      * ``"zscore_fixed"`` — feature z-score, fixed threshold
        (#z_score.py:276-294; threshold 5.0 CelebA, 4.0 MNIST `# 1,2,8.py:229-239`).
      * ``"zscore_elbow"`` — histogram elbow auto-threshold
        (#z_score + 엘보우 threshold.py:268-284).
      * ``"zscore_dbscan"`` — DBSCAN clean-ratio calibrated quantile
        (# z_score + DBSCAN.py:272-326).
      * ``"loss_gmm"`` — per-sample D loss + 2-component GMM intersection
        (#clean 분포...py:272-316).
      * ``"loss_ensemble"`` — median{GMM, P75, IQR} threshold
        (# 종합 loss.py:270-301).
      * ``"loss_percentile"`` — drop top ``loss_ratio`` by percentile
        (# final.py:343-374).
      * ``"batch_quantile_mask"`` — per-batch bottom-``mask_quantile`` D-score
        mask inside the train step (# 상위 10%...X.py:280-291).
      * ``"autoencoder"`` — AE reconstruction error > mean + k*std
        (#autoencoder.py:307-322).
    """

    method: str = "none"
    # feature-space options
    feature_extractor: str = "resnet18"  # resnet18 | resnet18_1ch | none
    z_threshold: Optional[float] = 5.0  # None => elbow auto
    z_std_mode: str = "torch"  # "torch" (n-1, #z_score.py:288) | "numpy_eps" (# 1,2,8.py:166)
    strict_less: bool = True  # `<` (#z_score.py:293) vs `<=` (# z_score + DBSCAN.py:325)
    # DBSCAN calibration (# z_score + DBSCAN.py:272)
    dbscan_eps: float = 20.0
    dbscan_min_samples: int = 3
    # loss-space options
    loss_ratio: float = 0.2  # top-fraction dropped (# final.py:343)
    # schedule: when the strainer runs
    prefilter: bool = False  # once before training (# final.py:414-427)
    start_epoch: int = 3  # per-epoch refinement start (# final.py:440)
    every_epoch: bool = False  # re-strain each epoch vs once (#z_score.py once @3)
    reset_each_epoch: bool = False  # restore full set at epoch end (#clean...py:414)
    # scheduled keep-ratio (C21).  Mapping epoch -> clean_ratio.
    clean_ratio_schedule: Optional[Tuple[Tuple[int, float], ...]] = None
    # quirk #1 of SURVEY §2.4: `# final.py:443` passes clean_ratio as
    # loss_ratio, inverting the keep fraction.  True replicates that behavior.
    final_py_ratio_inversion: bool = False
    # per-batch quantile mask (C19)
    mask_quantile: float = 0.1
    mask_start_epoch: int = 10
    # autoencoder strainer (C7)
    ae_sigma: float = 2.0
    ae_train_epoch: int = 3
    ae_train_epochs: int = 5
    ae_lr: float = 1e-3
    # fake-pool / recycle machinery (C20)
    #   "none" | "in_batch" (# 상위 10% 제거해서...py:243-269)
    #          | "pool"     (# fake concate.py:540-628, device-resident)
    fake_concat: str = "none"
    fake_pool_fraction: float = 0.1  # pool size = frac * |dataset|
    fake_concat_start_epoch: int = 3
    in_batch_recycle_quantile: float = 0.1  # bottom-10% D-score reals -> fakes
    # BN-mode quirk (#clean 분포...py:275; SURVEY §2.4 item 4): scoring passes
    # put D in eval mode and never restore train mode.
    bn_eval_after_score: bool = False
    # scoring-pass batch size.  The reference scores with DataLoader batch 64
    # (`# final.py:351`, `#z_score.py:282`); every scoring pass here runs D/the
    # feature net in eval mode, so per-sample results are batch-size-invariant
    # and a TPU-friendly batch keeps the MXU full (batch 64 leaves the
    # per-epoch full-dataset pass ~25% of Trainer wall time; 512 makes it
    # noise).  Set 64 only if hunting bitwise loader-order artifacts.
    score_batch: int = 512
    # loss_percentile scoring precision (strain/score.fused_percentile_refine):
    #   "band_bf16": bf16 bulk scoring + exact-f32 re-score of the samples
    #     within band_eps of the percentile threshold — mask provably equals
    #     the all-f32 mask (equivalence pinned in tests/test_band_scoring.py;
    #     drift margins quantified by scripts/tolerance_analysis.py), at a
    #     fraction of the scoring cost.  In-graph fallback to full f32 if the
    #     band overflows band_capacity_frac of the scored set.
    #   "f32": legacy full-f32 scoring pass (strain/score.score_d_losses).
    # GMM/ensemble deciders always score f32 (their thresholds depend on the
    # whole loss distribution, not an order statistic — no band exactness).
    score_precision: str = "band_bf16"
    # band half-width RELATIVE to the decision value (eps * max(1, |thr|)):
    # bf16 drift is mantissa-relative; measured normalized drift p100 is
    # 0.0072 on CPU / ~4e-4 on v5e (scripts/tolerance_analysis.py), so
    # eps/2 = 0.025 carries >=3.5x margin.  Capacity 1/16 of the scored set
    # bounds the f32 re-score cost; the in-graph full-f32 fallback guards
    # overflow.
    band_eps: float = 0.05
    band_capacity_frac: float = 0.0625
    # lax.scan unroll for the bulk scoring scans (strain/score._scan_batches):
    # iterations carry no state, so unrolling overlaps HBM gathers with MXU
    # work; results identical.  1 = no unrolling.
    score_unroll: int = 1


# ---------------------------------------------------------------------------
# Training


@dataclass(frozen=True)
class TrainConfig:
    """Optimization & loop config (components C9-C11, C21, C24, C25)."""

    epochs: int = 5
    lr_g: float = 2e-4
    lr_d: float = 2e-4  # TTUR variants use 1e-4 (`# final.py:265`)
    beta1: float = 0.5
    beta2: float = 0.999
    adam_defaults: bool = False  # MNIST scripts use torch Adam defaults (`#8.py:103`)
    real_label: float = 1.0
    fake_label: float = 0.0  # label smoothing 0.9/0.1 in `# 1,2,8.py:273-274`
    d_loss_reduction: str = "sum"  # "sum" (#%basic.py:270) | "half_mean" (#8.py:130)
    g_before_d: bool = False  # MNIST baselines update G first (`#8.py:118-132`)
    lr_decay_epoch: Optional[int] = None  # lr *= lr_decay_factor from this epoch
    lr_decay_factor: float = 0.1  # `# final.py:377-380`
    seed: int = 999
    log_every: int = 50
    sample_every: int = 500
    fixed_noise_n: int = 64
    # The reference samples fixed-noise grids with netG still in TRAIN mode
    # under no_grad (`#%basic.py:301-303` — no .eval() call anywhere), i.e.
    # BatchNorm uses the fixed-noise batch's own statistics.  False = use
    # running averages (a conventional eval-mode sample; deviation, see
    # docs/PARITY.md).
    sample_train_bn: bool = True
    # failure detection (SURVEY §5): verify params are finite at epoch ends
    check_finite: bool = False
    # scan-fused steps per device dispatch (train/steps.py
    # make_chunked_train_step).  >1 removes per-step dispatch overhead and
    # host syncs (~5% throughput on a remote-attached chip); 1 restores
    # step-at-a-time execution.  Epoch/segment remainders (< chunk) use the
    # per-step path; fixed-noise sample points cut segments exactly, so
    # chunking never changes img_list frames.  32 matches the published
    # bench config (bench.py, scripts/bench_trainer.py).
    steps_per_dispatch: int = 32
    # lax.scan unroll for the chunked executor (results identical; >1 lets
    # XLA overlap adjacent steps' HBM traffic with MXU work at the cost of a
    # roughly-unroll-times-larger program to compile).
    scan_unroll: int = 1
    # After a strain event the step count (n_active // batch) is data-
    # dependent; fetching it costs one blocking device round trip (~28 ms
    # remote) that serializes the scoring pass against the first training
    # dispatch.  With this on, epochs with no console step logging and no
    # mid-epoch sampling dispatch a static number of gated chunks (the step
    # count rides along as a device scalar; dead steps skip behind a
    # lax.cond) and fetch the packed stats WHILE the chunks run — results
    # are bitwise identical (tests/test_chunked.py, tests/test_deferred.py).
    defer_epoch_stats: bool = True


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation suite config (components C22, C23)."""

    fid: bool = False
    fid_every_epochs: Optional[int] = None  # `# 1,2,8.py` every 100 epochs
    fid_n_samples: int = 1000
    fid_normalize_activations: bool = False  # L2-norm variant (# 1,2,8.py:205)
    feature_distance: bool = False  # ResNet50 mean-feature L2 (#strainer gan.py:488)
    wasserstein: bool = False  # PCA-50 + per-dim W1 (#strainer gan.py:491-507)


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout (component C27 — new, absent in reference)."""

    dp: int = 1  # data-parallel axis size; -1 = all available devices
    mesh_axis_name: str = "dp"


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "basic"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    strain: StrainConfig = field(default_factory=StrainConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "ExperimentConfig":
        raw = json.loads(s)

        def _mk(cls, d):
            if d is None:
                return cls()
            kw = {}
            for f in dataclasses.fields(cls):
                if f.name in d:
                    v = d[f.name]
                    if isinstance(v, list):
                        v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
                    kw[f.name] = v
            return cls(**kw)

        sources = tuple(
            _mk(SourceSpec, s) for s in raw.get("data", {}).get("sources", [])
        ) or (SourceSpec("synthetic_faces"),)
        data = _mk(DataConfig, {**raw.get("data", {}), "sources": None})
        data = dataclasses.replace(data, sources=sources)
        return ExperimentConfig(
            name=raw.get("name", "custom"),
            data=data,
            model=_mk(ModelConfig, raw.get("model")),
            strain=_mk(StrainConfig, raw.get("strain")),
            train=_mk(TrainConfig, raw.get("train")),
            eval=_mk(EvalConfig, raw.get("eval")),
            parallel=_mk(ParallelConfig, raw.get("parallel")),
        )


# ---------------------------------------------------------------------------
# Preset registry — one preset per reference script (SURVEY.md §2.1).

# drop_last=False everywhere below: every CelebA-family reference loader
# keeps torch's default (`#%basic.py:76`), so each epoch ends in one exact
# partial batch (its own BN statistics) — see DataConfig.drop_last.
_CELEBA_DATA = DataConfig(
    sources=(SourceSpec("celeba"),), image_size=64, channels=3,
    batch_size=128, drop_last=False,
)
_CELEBA_CIFAR20K = DataConfig(
    sources=(SourceSpec("celeba"), SourceSpec("cifar10", count=20000)),
    mixer="shuffled_combined", drop_last=False,
)
_CELEBA_CIFAR_FULL = DataConfig(
    sources=(SourceSpec("celeba"), SourceSpec("cifar10")),
    mixer="shuffled_combined", drop_last=False,
)
_CELEBA_ANIME = DataConfig(
    sources=(SourceSpec("celeba"), SourceSpec("anime")), mixer="combined",
    drop_last=False,
)
_MNIST_MLP_MODEL = ModelConfig(arch="mlp", nc=1, img_size=784)
_MNIST_128_MODEL = ModelConfig(
    arch="mlp", nc=1, img_size=784, g_batchnorm=True, d_dropout=0.3
)


def _mnist_data(batch: int, sources: Tuple[SourceSpec, ...], mixer: str = "concat",
                auto_batch_divisor=None):
    return DataConfig(
        sources=sources, image_size=28, channels=1, batch_size=batch,
        mixer=mixer, flatten=True, auto_batch_divisor=auto_batch_divisor,
    )


PRESETS: Dict[str, ExperimentConfig] = {}


def _register(cfg: ExperimentConfig) -> ExperimentConfig:
    PRESETS[cfg.name] = cfg
    return cfg


# -- baselines ---------------------------------------------------------------
_register(ExperimentConfig(
    name="basic",  # `#%basic.py` — vanilla DCGAN, 5 epochs, no strain
    data=_CELEBA_DATA,
    train=TrainConfig(epochs=5),
))
_register(PRESETS["basic"].replace(name="celeba"))  # `#celeba.py` (prints only)

_register(ExperimentConfig(
    name="mnist8",  # `#8.py` — digit-8-only MLP GAN, G updated before D
    data=_mnist_data(64, (SourceSpec("mnist", class_filter=(8,)),),
                     auto_batch_divisor=10),
    model=_MNIST_MLP_MODEL,
    train=TrainConfig(epochs=300, lr_g=2e-4, lr_d=2e-4, adam_defaults=True,
                      d_loss_reduction="half_mean", g_before_d=True),
))
_register(ExperimentConfig(
    name="mnist_8_2",  # `Untitled-2.py` — 90% 8s + 10% 2s, no strain
    data=_mnist_data(64, (SourceSpec("mnist", class_filter=(8,)),
                          SourceSpec("mnist", class_filter=(2,), class_fraction=0.1)),
                     auto_batch_divisor=100),
    model=_MNIST_MLP_MODEL,
    train=TrainConfig(epochs=300, adam_defaults=True,
                      d_loss_reduction="half_mean", g_before_d=True),
))
_register(ExperimentConfig(
    name="mnist_1_2_8_baseline",  # `Untitled-3.py` — 80% 8s + 10% 1s + 10% 2s
    data=_mnist_data(64, (SourceSpec("mnist", class_filter=(8,)),
                          SourceSpec("mnist", class_filter=(1,), class_fraction=0.1),
                          SourceSpec("mnist", class_filter=(2,), class_fraction=0.1))),
    model=_MNIST_MLP_MODEL,
    train=TrainConfig(epochs=300, adam_defaults=True,
                      d_loss_reduction="half_mean", g_before_d=True),
))
_register(ExperimentConfig(
    name="celeba_dog_baseline",  # `Untitled-5.py` — CelebA+CIFAR-dog, FID, no strain
    data=DataConfig(sources=(SourceSpec("celeba"),
                             SourceSpec("cifar10", class_filter=(5,))),
                    mixer="shuffled_combined", drop_last=False),
    train=TrainConfig(epochs=5),
    eval=EvalConfig(fid=True),
))

# -- feature-space strainers -------------------------------------------------
_register(ExperimentConfig(
    name="zscore",  # `#z_score.py` — fixed z>5, applied once at epoch 3
    data=_CELEBA_CIFAR20K,
    train=TrainConfig(epochs=10),
    strain=StrainConfig(method="zscore_fixed", z_threshold=5.0,
                        start_epoch=3, every_epoch=False),
))
_register(ExperimentConfig(
    name="zscore_elbow",  # `#z_score + 엘보우 threshold.py` — prefilter, auto thr
    data=_CELEBA_CIFAR_FULL,
    train=TrainConfig(epochs=10),
    strain=StrainConfig(method="zscore_elbow", z_threshold=None, prefilter=True),
))
_register(ExperimentConfig(
    name="zscore_dbscan",  # `# z_score + DBSCAN.py` — DBSCAN-calibrated quantile
    data=_CELEBA_CIFAR20K,
    train=TrainConfig(epochs=10),
    strain=StrainConfig(method="zscore_dbscan", prefilter=True,
                        strict_less=False),
))
_register(ExperimentConfig(
    name="autoencoder",  # `#autoencoder.py` — AE recon-error strain from epoch 3
    data=_CELEBA_CIFAR20K,
    train=TrainConfig(epochs=10),
    strain=StrainConfig(method="autoencoder", start_epoch=3, every_epoch=True,
                        reset_each_epoch=True, ae_sigma=2.0),
))

# -- loss-space strainers ----------------------------------------------------
_register(ExperimentConfig(
    name="loss_gmm",  # `#clean 분포...py` — GMM intersection, every epoch
    data=_CELEBA_CIFAR20K,
    train=TrainConfig(epochs=10),
    strain=StrainConfig(method="loss_gmm", start_epoch=0, every_epoch=True,
                        reset_each_epoch=True, bn_eval_after_score=True),
))
_register(ExperimentConfig(
    name="loss_ensemble",  # `# 종합 loss.py` — median{GMM,P75,IQR} + ratio sched
    data=_CELEBA_CIFAR20K,
    train=TrainConfig(epochs=10, lr_decay_epoch=3),
    strain=StrainConfig(method="loss_ensemble", start_epoch=3, every_epoch=True,
                        reset_each_epoch=True,
                        clean_ratio_schedule=((0, 1.0), (3, 0.9), (5, 0.8), (7, 0.7))),
))
_register(ExperimentConfig(
    name="zscore_loss",  # `# z_score + loss.py` — z prefilter + loss refine
    data=_CELEBA_CIFAR_FULL.__class__(
        sources=(SourceSpec("celeba"), SourceSpec("cifar10")),
        mixer="shuffled_combined", seed=1, drop_last=False),
    train=TrainConfig(epochs=10, seed=1),
    strain=StrainConfig(method="loss_percentile", prefilter=True,
                        z_threshold=None, start_epoch=3, every_epoch=True,
                        loss_ratio=0.2),
))
_register(ExperimentConfig(
    name="batch_mask",  # `# 상위 10% loss값...X.py` — per-batch quantile mask
    data=DataConfig(sources=(SourceSpec("celeba"),
                             SourceSpec("cifar10", fraction_of_primary=0.1)),
                    mixer="labeled", drop_last=False),
    train=TrainConfig(epochs=20),
    strain=StrainConfig(method="batch_quantile_mask", mask_quantile=0.1,
                        mask_start_epoch=10),
))

# -- fake-concatenation family ----------------------------------------------
_register(ExperimentConfig(
    name="in_batch_recycle",  # `# 상위 10% 제거해서 fake image에 concate.py`
    data=_CELEBA_DATA,
    train=TrainConfig(epochs=5),
    strain=StrainConfig(method="none", fake_concat="in_batch",
                        fake_concat_start_epoch=3,
                        in_batch_recycle_quantile=0.1),
))
_register(ExperimentConfig(
    name="strainer_gan",  # `#strainer gan.py` — TTUR + loss refine + eval suite
    data=_CELEBA_ANIME,
    train=TrainConfig(epochs=10, lr_d=1e-4, lr_g=2e-4),
    strain=StrainConfig(method="loss_percentile", start_epoch=3,
                        every_epoch=True, loss_ratio=0.2),
    eval=EvalConfig(fid=True, feature_distance=True, wasserstein=True),
))
_register(ExperimentConfig(
    name="fake_concat",  # `# fake concate.py` — z-score outlier pool -> fakes
    data=_CELEBA_ANIME,
    train=TrainConfig(epochs=10, lr_d=1e-4, lr_g=2e-4),
    strain=StrainConfig(method="loss_percentile", start_epoch=3,
                        every_epoch=True, loss_ratio=0.2,
                        fake_concat="pool", fake_pool_fraction=0.1,
                        fake_concat_start_epoch=3),
    eval=EvalConfig(fid=True, feature_distance=True, wasserstein=True),
))
_register(ExperimentConfig(
    name="strainer_concat_fast",  # `# strainer gan + concate.py` — prefilter+pool
    data=_CELEBA_ANIME,
    train=TrainConfig(epochs=10, lr_d=1e-4, lr_g=2e-4),
    strain=StrainConfig(method="loss_percentile", prefilter=True,
                        z_threshold=5.0, start_epoch=3, every_epoch=True,
                        loss_ratio=0.2, fake_concat="pool",
                        fake_pool_fraction=0.1, fake_concat_start_epoch=3),
    eval=EvalConfig(fid=True, feature_distance=True, wasserstein=True),
))
_register(ExperimentConfig(
    name="loss_concat_fast",  # `# loss만 + concate + fast + 10%.py` — no prefilter
    data=_CELEBA_ANIME,
    train=TrainConfig(epochs=10, lr_d=1e-4, lr_g=2e-4),
    strain=StrainConfig(method="loss_percentile", start_epoch=3,
                        every_epoch=True, loss_ratio=0.2, fake_concat="pool",
                        fake_pool_fraction=0.1, fake_concat_start_epoch=3),
    eval=EvalConfig(fid=True, feature_distance=True, wasserstein=True),
))

# -- flagship ----------------------------------------------------------------
_register(ExperimentConfig(
    name="final",  # `# final.py` live section — flagship pipeline
    data=_CELEBA_CIFAR_FULL,
    train=TrainConfig(epochs=10, lr_d=1e-4, lr_g=2e-4, lr_decay_epoch=3),
    strain=StrainConfig(method="loss_percentile", prefilter=True,
                        z_threshold=5.0, start_epoch=3, every_epoch=True,
                        clean_ratio_schedule=((0, 1.0), (3, 0.8), (5, 0.6), (7, 0.5)),
                        final_py_ratio_inversion=True,
                        bn_eval_after_score=True),
))
_register(ExperimentConfig(
    name="mnist_full",  # `# 1,2,8.py` — MNIST full pipeline + periodic FID
    data=_mnist_data(64, (SourceSpec("mnist", class_filter=(8,)),
                          SourceSpec("mnist", class_filter=(1,), class_fraction=0.1),
                          SourceSpec("mnist", class_filter=(2,), class_fraction=0.1))),
    model=_MNIST_128_MODEL,
    train=TrainConfig(epochs=300, adam_defaults=True, real_label=0.9,
                      fake_label=0.1, d_loss_reduction="half_mean"),
    strain=StrainConfig(method="zscore_fixed", feature_extractor="resnet18_1ch",
                        z_threshold=4.0, z_std_mode="numpy_eps", prefilter=True,
                        # quirk #3 (SURVEY §2.4): the per-epoch loss refinement
                        # in `# 1,2,8.py:263-267` is a no-op (loader reset);
                        # live semantics = prefilter only.
                        start_epoch=3, every_epoch=False),
    eval=EvalConfig(fid=True, fid_every_epochs=100, fid_n_samples=1000,
                    fid_normalize_activations=True),
))


def get_preset(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]
