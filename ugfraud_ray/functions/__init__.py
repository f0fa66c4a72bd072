from ugfraud_ray.functions.numerics import logsumexp, safe_log
from ugfraud_ray.functions.metrics import average_precision, roc_auc
