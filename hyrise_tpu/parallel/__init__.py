from hyrise_tpu.parallel.mesh import QueryMesh

__all__ = ["QueryMesh"]
