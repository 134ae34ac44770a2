"""Parallelism: GSPMD meshes + sharding rules (mesh), GPipe pipeline
parallelism (pipeline), all-gather-KV sequence parallelism (sequence),
multi-host init + hybrid DCN x ICI meshes (distributed)."""
from . import distributed, mesh, pipeline, sequence  # noqa: F401
