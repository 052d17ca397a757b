"""Evaluation: episodic drivers + detection metrics.

The reference leans on pycocotools/lvis C extensions for COCOeval
(SURVEY.md §2.3); this package ships a self-contained numpy
implementation of the COCO AP protocol (coco_eval_np.py) plus the Sylph
episodic evaluators and the two-phase meta-test drivers."""

from .coco_eval_np import COCOEval, DetEvalInputs
from .evaluators import (AREvaluator, COCOMetaEvaluator, COCOOWDEvaluator,
                         FewshotLVISEvaluator)
from .meta_eval import (MetaTestDriver, format_class_codes,
                        generate_class_codes, run_query_inference)
from .postprocess import detections_to_coco_results

__all__ = [
    "COCOEval", "DetEvalInputs", "COCOMetaEvaluator", "AREvaluator",
    "COCOOWDEvaluator", "FewshotLVISEvaluator", "MetaTestDriver",
    "generate_class_codes", "format_class_codes", "run_query_inference",
    "detections_to_coco_results",
]
