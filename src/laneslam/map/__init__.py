"""L4 map/state store: device-resident fixed-capacity SLAM state."""

from laneslam.map.map import MapState, make_empty_map
from laneslam.map import ops
