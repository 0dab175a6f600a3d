"""L9 data layer: dataset loaders + synthetic scene generation.

Host-side Python (PNG decode, calib parsing) feeding device-resident
pipelines via double-buffered transfers (runtime layer).
"""

from laneslam.data.kitti import KittiOdometry
from laneslam.data.euroc import EurocStereo
from laneslam.data.synthetic import SyntheticScene, render_scene_frame
