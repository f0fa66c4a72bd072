from ugfraud_ray.state.layout import GraphLayout, build_layout
from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
