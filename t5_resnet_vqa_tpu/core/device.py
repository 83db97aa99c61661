"""Device selection honoring the config's ``trainer_kwargs.device`` field.

The reference reads the field and only logs it (faster_rcnn_vqa_trainer.py:61);
here it actually selects the JAX platform. Subtlety: TPU-class PJRT plugins
register under their own platform *name* (e.g. this image's tunneled chip
registers as "axon") while their devices still report ``platform == "tpu"`` —
so for device="tpu" we first check whether the default resolution already
yields TPU devices and only force ``jax_platforms=tpu`` when it does not.
Forcing it blindly breaks plugin-registered TPUs ("No jellyfish device
found").
"""

from __future__ import annotations


def select_device(device: str) -> None:
    """Apply the config's device choice. Must run before any dispatch."""
    if device == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        return
    if device == "tpu":
        import jax
        try:
            if any(d.platform == "tpu" for d in jax.devices()):
                return          # default resolution already found the TPU
        except Exception:
            pass
        try:
            jax.config.update("jax_platforms", "tpu")
        except Exception:
            pass
