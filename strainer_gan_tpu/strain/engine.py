"""Strainer orchestration (components C12-C21 wiring).

Maps each StrainConfig.method to the reference's exact schedule:

| method              | when                         | reference flow                |
|---------------------|------------------------------|-------------------------------|
| zscore_fixed        | once AT start_epoch (or      | `#z_score.py:309-321`;        |
|                     | prefilter, MNIST)            | `# 1,2,8.py:229-239`          |
| zscore_elbow        | prefilter once               | `#z_score + 엘보우...:350-359`|
| zscore_dbscan       | prefilter once               | `# z_score + DBSCAN.py:339-358`|
| loss_gmm            | every epoch (reset at end)   | `#clean 분포...py:330-339,414`|
| loss_ensemble       | every epoch >= 3, order-     | `# 종합 loss.py:360-377,456`  |
|                     | truncated by ratio schedule  |                               |
| loss_percentile     | every epoch >= 3, re-refined | `# final.py:440-448`;         |
|                     | from the prefiltered base    | `#strainer gan.py:571-576`    |
| autoencoder         | AE trained at epoch 3, strain| `#autoencoder.py:339-357`     |
|                     | every epoch >= 3 from full   |                               |
| batch_quantile_mask | inside the train step        | `# 상위 10%...X.py:280-291`   |

The engine's strain state is boolean masks over the full device-resident
dataset — the dataset itself is never subset or re-staged, and the *decision*
masks stay in HBM.  One derived artifact is host-materialized: after a
permanent base strain (prefilter / one-shot z-score), ``_set_base`` fetches
the base mask once and keeps its compacted int32 index list so per-epoch
scoring passes can skip permanently-dropped samples (the scoring scan gathers
by index from the SAME full-size HBM array; one extra compile per distinct
base size).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..data.pipeline import DeviceDataset, normalize_u8
from ..models.autoencoder import ConvAutoEncoder
from ..train.schedules import clean_ratio_at
from . import score as SC
from . import thresholds as TH


def _truncate_in_order(mask: jnp.ndarray, num_keep: jnp.ndarray) -> jnp.ndarray:
    """Keep only the first ``num_keep`` True entries in dataset order —
    ``Subset(clean_dataset, range(num_clean))`` (`# 종합 loss.py:371-372`)."""
    ranks = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return jnp.logical_and(mask, ranks < num_keep)


class StrainerEngine:
    """Holds strainer state (base mask, AE params, pool) across epochs."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        disc,
        dataset: DeviceDataset,
        feature_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        score_batch: int = 64,
    ):
        self.cfg = cfg
        self.sc = cfg.strain
        self.disc = disc
        self.dataset = dataset
        self.feature_fn = feature_fn
        self.score_batch = score_batch
        self.flatten = cfg.data.flatten
        n = dataset.n
        self.base_active = jnp.ones((n,), bool)  # after prefilter/permanent strain
        self.active = jnp.ones((n,), bool)
        self.d_bn_eval = False  # quirk: eval mode sticks after scoring
        self.ae = None
        self.ae_params = None
        self.last_threshold = None
        self.last_scores = None  # max-|z| or per-sample losses of last strain
        self.last_mask = None  # the mask produced by the last strain event
        self.last_batch_scores = None  # in-step mask scores (batch_quantile_mask)
        self.last_batch_mask = None  # the in-step keep mask for those scores
        # valid leading lanes of last_batch_scores/mask: when the epoch ends
        # in a drop_last=False partial tail (`#%basic.py:76`), the recorded
        # step is lane-masked and only the first ``tail`` lanes are real
        # samples — the parity oracle must quantile those, exactly
        # torch.quantile on the reference's smaller final batch
        self.last_batch_valid = None
        self.last_band_stats = None  # [n_band, overflowed, max_drift] (band path)
        # band-overflow hysteresis: a weakly-separating D concentrates most
        # scores inside the band, so the fused path pays bf16 bulk + full-f32
        # fallback (+~135 ms/epoch at 66k on v5e, measured) — worse than plain
        # f32.  When the Trainer's packed stats fetch observes an overflow it
        # sets this cooloff; the engine scores plain-f32 for that many strain
        # events before retrying the band (one retry per window amortizes the
        # double-scan to ~1/5 of its cost in persistently-concentrated
        # regimes, and re-engages within a window once the D separates).
        self.band_cooloff = 0
        self.last_score_path = None  # "band" | "f32" (last loss_percentile)
        self._features = None  # cached features for prefilter-style strainers
        self._base_subset = None  # int32 indices of base_active, when it shrank

    # ------------------------------------------------------------------ utils
    def _features_full(self) -> jnp.ndarray:
        if self._features is None:
            if self.feature_fn is None:
                raise ValueError(
                    f"strainer {self.sc.method!r} needs a feature extractor"
                )
            self._features = SC.score_features(
                self.feature_fn, self.dataset, self.score_batch
            )
        return self._features

    def _set_base(self, mask: jnp.ndarray) -> None:
        """Record a new permanent base mask + its compacted index subset.

        The subset lets per-epoch loss scoring skip permanently-dropped
        samples (the reference scores the prefiltered Subset,
        `# final.py:440-443`); one host fetch of the mask per strain *event*
        (not per epoch)."""
        import numpy as np

        self.base_active = mask
        idx = np.nonzero(np.asarray(mask))[0]
        self._base_subset = (
            jnp.asarray(idx, jnp.int32) if len(idx) < self.dataset.n else None
        )

    def _losses(self, state) -> jnp.ndarray:
        subset = self._base_subset if self.sc.method == "loss_percentile" else None
        losses = SC.score_d_losses(
            self.disc, state.d_params, state.d_stats, self.dataset,
            real_label=self.cfg.train.real_label,
            batch_size=self.score_batch, flatten=self.flatten,
            subset=subset, unroll=self.sc.score_unroll,
        )
        if subset is not None:
            # scatter back to full-size (inactive lanes +inf: they are never
            # kept and sort last in every threshold)
            losses = (
                jnp.full((self.dataset.n,), jnp.inf, jnp.float32)
                .at[subset].set(losses)
            )
        if self.sc.bn_eval_after_score:
            self.d_bn_eval = True  # SURVEY §2.4 item 4
        self.last_scores = losses
        return losses

    def _zscore_mask(self, valid=None):
        feats = self._features_full()
        sc = self.sc
        if sc.method == "zscore_fixed" or (
            sc.method == "loss_percentile" and sc.z_threshold is not None
        ):
            mask, thr = TH.zscore_fixed_mask(
                feats, sc.z_threshold, sc.z_std_mode, sc.strict_less, valid
            )
        elif sc.method == "zscore_elbow" or sc.z_threshold is None:
            mask, thr = TH.zscore_elbow_mask(feats, sc.z_std_mode, valid)
        elif sc.method == "zscore_dbscan":
            ratio = TH.dbscan_clean_ratio(
                feats, sc.dbscan_eps, sc.dbscan_min_samples, valid
            )
            mask, thr = TH.zscore_quantile_mask(feats, ratio, sc.z_std_mode, valid)
        else:
            raise AssertionError(sc.method)
        self.last_threshold = thr
        from . import thresholds as _TH

        self.last_scores = _TH._masked_max_abs_z(feats, valid, sc.z_std_mode)
        return mask

    # ------------------------------------------------------------- lifecycle
    def prefilter(self, key: jax.Array) -> jnp.ndarray:
        """Once-before-training strain (`# final.py:414-427` z-score;
        elbow/DBSCAN variants).  Returns the base active mask."""
        sc = self.sc
        if not sc.prefilter or sc.method == "none":
            return self.active
        mask = self._zscore_mask()
        self._set_base(mask)
        self.active = mask
        self.last_mask = mask
        return self.active

    def outlier_mask(self) -> jnp.ndarray:
        """Complement of the z-score inlier mask — the fake-pool source
        (`# fake concate.py:546-548`)."""
        feats = self._features_full()
        thr = self.sc.z_threshold if self.sc.z_threshold is not None else 5.0
        mask, _ = TH.zscore_fixed_mask(
            feats, thr, self.sc.z_std_mode, self.sc.strict_less
        )
        return jnp.logical_not(mask)

    def on_epoch_start(self, epoch: int, state, key: jax.Array) -> jnp.ndarray:
        sc = self.sc
        m = sc.method
        if m in ("none", "batch_quantile_mask"):
            return self.active

        if m in ("zscore_fixed", "zscore_elbow", "zscore_dbscan"):
            if sc.prefilter or sc.every_epoch:
                return self.active
            if epoch == sc.start_epoch:  # `#z_score.py:309-321`: once, at 3
                mask = self._zscore_mask()
                self._set_base(mask)
                self.active = mask
                self.last_mask = mask
            return self.active

        if m == "loss_gmm" and epoch >= sc.start_epoch:
            losses = self._losses(state)
            mask, thr = TH.gmm_mask(losses)  # over the FULL set (`:330-339`)
            self.last_threshold = thr
            self.active = mask
            self.last_mask = mask
            return self.active

        if m == "loss_ensemble" and epoch >= sc.start_epoch:
            losses = self._losses(state)
            mask, thr = TH.ensemble_mask(losses)
            self.last_threshold = thr
            ratio = clean_ratio_at(epoch, sc.clean_ratio_schedule)
            num_keep = (jnp.sum(mask) * ratio).astype(jnp.int32)
            self.active = _truncate_in_order(mask, num_keep)
            self.last_mask = self.active
            return self.active

        if m == "loss_percentile" and epoch >= sc.start_epoch:
            if sc.final_py_ratio_inversion:
                # quirk #1 (`# final.py:443`): clean_ratio passed AS loss_ratio
                loss_ratio = clean_ratio_at(epoch, sc.clean_ratio_schedule)
            else:
                loss_ratio = sc.loss_ratio
            use_band = sc.score_precision == "band_bf16"
            if use_band and self.band_cooloff > 0:
                self.band_cooloff -= 1
                use_band = False
            if use_band:
                # one fused dispatch: bf16 bulk scoring + exact-f32 band
                # re-score + threshold + mask (see fused_percentile_refine)
                mask, thr, losses, band_stats = SC.fused_percentile_refine(
                    self.disc, state.d_params, state.d_stats, self.dataset,
                    loss_ratio, valid=self.base_active,
                    real_label=self.cfg.train.real_label,
                    batch_size=self.score_batch, flatten=self.flatten,
                    subset=self._base_subset,
                    band_eps=sc.band_eps,
                    band_capacity_frac=sc.band_capacity_frac,
                    unroll=sc.score_unroll,
                )
                if sc.bn_eval_after_score:
                    self.d_bn_eval = True  # SURVEY §2.4 item 4
                self.last_scores = losses
                self.last_band_stats = band_stats  # device (3,) f32
                self.last_score_path = "band"
            else:
                losses = self._losses(state)
                mask, thr = TH.percentile_refine_mask(
                    losses, loss_ratio, valid=self.base_active
                )
                self.last_band_stats = None  # stats describe the band path only
                self.last_score_path = "f32"
            self.last_threshold = thr
            self.active = mask
            self.last_mask = mask
            return self.active

        if m == "autoencoder":
            if epoch == sc.ae_train_epoch:
                self._train_autoencoder(key)
            if epoch >= sc.start_epoch and self.ae_params is not None:
                errors = SC.score_ae_errors(
                    self.ae, self.ae_params, self.dataset, self.score_batch
                )
                mask, thr = TH.ae_error_mask(errors, sc.ae_sigma)
                self.last_threshold = thr
                self.last_scores = errors
                self.last_mask = mask
                self.active = mask  # reset-to-full then strain (`:346-351`)
            return self.active

        return self.active

    def on_epoch_end(self, epoch: int) -> jnp.ndarray:
        if self.sc.reset_each_epoch:
            self.active = self.base_active  # `#clean 분포...py:414-415`
        return self.active

    # ----------------------------------------------------------- AE training
    def build_ae(self, key: jax.Array):
        """Construct the strainer AE and its init params (deterministic given
        the key) — also used by checkpoint restore to rebuild the module
        around restored params."""
        cfg = self.cfg
        self.ae = ConvAutoEncoder(
            nc=cfg.model.nc,
            compute_dtype=jnp.float32,  # MSE training is cheap; keep f32
        )
        dummy = jnp.zeros(
            (2, cfg.data.image_size, cfg.data.image_size, cfg.model.nc), jnp.float32
        )
        return self.ae.init({"params": key}, dummy)["params"]

    def _train_autoencoder(self, key: jax.Array):
        """`train_autoencoder` (`#autoencoder.py:296-305`): Adam(1e-3), MSE,
        5 epochs over the current (active) dataset."""
        cfg = self.cfg
        k_init, key = jax.random.split(key)
        params = self.build_ae(k_init)
        tx = optax.adam(self.sc.ae_lr)
        opt = tx.init(params)

        @jax.jit
        def ae_step(params, opt, batch_u8, w):
            x = normalize_u8(batch_u8, jnp.float32)

            def loss_fn(p):
                recon = self.ae.apply({"params": p}, x)
                per = jnp.mean(
                    (recon - x) ** 2, axis=tuple(range(1, x.ndim))
                )
                # weighted mean of per-sample means == torch MSELoss over the
                # ACTUAL (possibly partial) batch — the reference AE loader
                # keeps drop_last=False (`#autoencoder.py:296-305`), so its
                # last batch each epoch is smaller; pad lanes carry weight 0
                return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        bs = cfg.data.batch_size
        n_act = int(jnp.sum(self.active))
        tail = n_act % bs
        ones = jnp.ones((bs,), jnp.float32)
        tail_w = (jnp.arange(bs) < tail).astype(jnp.float32)
        for ep in range(self.sc.ae_train_epochs):
            key, k = jax.random.split(key)
            idx = self.dataset.epoch_indices(k, self.active, bs, drop_last=False)
            rows = idx.shape[0]
            for b in range(rows):
                batch = self.dataset.gather(idx[b])
                w = tail_w if (tail and b == rows - 1) else ones
                params, opt, _ = ae_step(params, opt, batch, w)
        self.ae_params = params
