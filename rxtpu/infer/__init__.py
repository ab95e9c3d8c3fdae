from rxtpu.infer.plate_leak import (  # noqa: F401
    apply_plate_mask,
    constrained_predict,
    greedy_assign,
    greedy_assign_jax,
    hungarian_assign,
    rescale,
)
from rxtpu.infer.fold import fold_for_inference  # noqa: F401
from rxtpu.infer.quant import (  # noqa: F401
    calibrate,
    make_quantized_predict_step,
    prepare_quantized,
    quantizable,
    quantize_variables,
)
from rxtpu.infer.tta import (  # noqa: F401
    make_scanned_tta_predict_step,
    make_tta_predict_step,
    predict_dataset,
)
from rxtpu.infer.submit import write_submission  # noqa: F401
