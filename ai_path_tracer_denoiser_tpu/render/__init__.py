from .wavefront import (  # noqa: F401
    RenderLoopState,
    generate_camera_rays,
    init_render_state,
    render,
    render_gbuffer_frame,
    trace_iteration,
)
from .motion_blur import advance_geoms  # noqa: F401
