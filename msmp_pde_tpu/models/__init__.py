from msmp_pde_tpu.models.registry import get_model, MODEL_REGISTRY
