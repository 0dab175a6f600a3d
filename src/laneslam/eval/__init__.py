"""L10 evaluation: ATE/RPE metrics and trajectory writers."""

from laneslam.eval.ate import ate_rmse, rpe
from laneslam.eval.writers import write_kitti_trajectory, write_tum_trajectory
