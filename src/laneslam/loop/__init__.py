"""L8 loop closure: device-resident keyframe DB retrieval + geometric verification."""

from laneslam.loop.kfdb import aggregate_descriptor, query_kfdb
from laneslam.loop.verify import verify_loop, verify_loops
