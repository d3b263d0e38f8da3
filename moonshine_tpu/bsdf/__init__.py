from .materials import (  # noqa: F401
    GLASS,
    LAMBERT,
    MIRROR,
    STANDARD_PBR,
    MaterialLanes,
    eval_bsdf,
    pdf_bsdf,
    sample_bsdf,
    is_delta,
)
