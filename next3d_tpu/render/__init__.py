from .ray_sampler import sample_rays
from .ray_marcher import mip_ray_marcher2
from .renderer import (
    ImportanceRenderer,
    generate_planes,
    project_onto_planes,
    sample_from_planes,
)
from .mesh import (
    angle2matrix,
    batch_orth_proj,
    face_vertices,
    generate_triangles,
)
from .rasterizer import rasterize_mesh, interpolate_face_attributes
from .fill_mouth import fill_mouth
from . import camera_utils, math_utils
