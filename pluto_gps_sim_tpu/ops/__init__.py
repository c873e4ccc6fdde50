from . import epoch, synth_jnp

__all__ = ["epoch", "synth_jnp"]
