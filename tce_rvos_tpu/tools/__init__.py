# Checkpoint surgery, visualization colormap, dataset converters
# (parity with reference tools/).
