from .checkpoint import export_mesh_snapshot, load_checkpoint, save_checkpoint
from .debug import anomaly_detection, checked
from .metrics import MetricLogger
from .timing import StageTimer, TimingResult, profiler_trace, time_fn
