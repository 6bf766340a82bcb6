from wgsassign_tpu.obs.profiling import RunTimer, maybe_profile

__all__ = ["RunTimer", "maybe_profile"]
