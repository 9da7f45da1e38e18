"""gym_quadruped_tpu."""
