from wgsassign_tpu.parallel.mesh import Runtime, make_runtime

__all__ = ["Runtime", "make_runtime"]
