from heatflow_tpu.mesh.structured import StructuredMesh, build_structured_mesh
from heatflow_tpu.mesh.axes import graded_axis

__all__ = ["StructuredMesh", "build_structured_mesh", "graded_axis"]
