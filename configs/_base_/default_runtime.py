# Runtime defaults (checkpoint every epoch, 50-iter logging, 12 epochs)
checkpoint_config = dict(interval=1)
log_interval = 50
log_config = dict(interval=50)
total_epochs = 12
seed = 0
canvas_shape = (800, 1344)   # static padded canvas for (1333, 800) test scale
max_instances = 100
