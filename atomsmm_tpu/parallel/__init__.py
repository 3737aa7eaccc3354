from .replicas import make_replicated_step, replicate_state
