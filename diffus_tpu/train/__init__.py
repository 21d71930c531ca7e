from diffus_tpu.train.losses import (
    ssim,
    ssim_loss,
    masked_mse,
    gradient_loss,
    masked_mse_edge_loss,
)
from diffus_tpu.train.impedance_train import (
    ImpedanceTrainConfig,
    synth_forward,
    train_step,
    train_impedance_scan,
    train_impedance,
    train_impedance_checkpointed,
)
from diffus_tpu.train.pose_recovery import (
    PoseRecoveryConfig,
    render_pose,
    recover_pose,
    recover_pose_multistart,
    sample_init_poses,
    recover_free,
)
from diffus_tpu.train.driver import CaseSpec, train_impedance_cases
from diffus_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from diffus_tpu.train.metrics import MetricsLogger
