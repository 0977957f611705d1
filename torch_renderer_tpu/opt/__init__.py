from .pose_fit import (
    CameraPoseFitter,
    DepthPoseFitter,
    PoseFitConfig,
    huber_loss,
    iou,
    patch_occlusion,
    pose_params_from_Rt,
    pose_params_to_Rt,
)
