from .coco_keypoint_eval import COCOKeypointEval

__all__ = ["COCOKeypointEval"]
