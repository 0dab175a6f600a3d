"""L5 frontend: per-frame feature extraction and tracking."""

from laneslam.frontend.extract import FrameFeatures, extract_features
from laneslam.frontend.odometry import OdometryState, TwoViewOdometry
