# Offline evaluation: DAVIS J&F, A2D precision/IoU metrics.
