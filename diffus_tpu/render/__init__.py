from diffus_tpu.render.renderer import (
    render_frame,
    render_bmode,
    render_sweep,
    simulate_rays,
    trace_rays,
    mri_projection,
)
