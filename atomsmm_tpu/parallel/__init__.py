from .hrex import HREXSampler, hrex_sample_lambda_states, make_hrex_swap
from .replicas import make_replicated_step, replicate_state
from .spatial import (
    sharded_cell_pair_energy_forces,
    sharded_pme_reciprocal_energy,
    sharded_pme_reciprocal_energy_fft,
)
