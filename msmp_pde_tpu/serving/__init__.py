"""Production inference: batched rollout engine, AOT export, HTTP server.

New capability over the reference (which ships only offline eval scripts,
experiments/eval*.py): a deployable serving path for trained surrogates —
load a checkpoint once, compile fixed-bucket rollout programs once, then
serve initial-condition windows at training-free latency.
"""
from msmp_pde_tpu.serving.engine import (  # noqa: F401
    RolloutEngine,
    build_serving_trainer,
    grid_from_h5,
)
from msmp_pde_tpu.serving.export import (  # noqa: F401
    export_rollout,
    load_exported,
)
