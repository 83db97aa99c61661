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
        devices = []
        try:
            devices = jax.devices()
        except Exception:
            pass
        if any(d.platform == "tpu" for d in devices):
            return              # default resolution already found the TPU
        # jax.devices() above initialized and cached the backends, so a
        # jax_platforms update here would be a silent no-op — fail loudly
        # instead of quietly training a 60-epoch run on CPU.
        raise RuntimeError(
            "trainer_kwargs.device='tpu' but no TPU devices are visible "
            f"(found: {[d.platform for d in devices] or 'none'}). "
            "Use device='cpu' to run on CPU explicitly.")
