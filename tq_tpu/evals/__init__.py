"""Workload drivers: calibrate->evaluate sweeps reproducing the
reference's three shell entry points plus the group-size grid
(evaluate_mlp.sh / evaluate_lstm.sh / evaluate_cnn.sh /
evaluate_group_size.py)."""
