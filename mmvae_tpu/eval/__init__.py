from . import classifiers, coherence, fid, generation, gmm, hmc, likelihoods, prd  # noqa: F401
from .coherence import (compute_accuracies, compute_accuracies_dataset,  # noqa: F401
                        compute_joint_accuracy, conditional_labels)
from .fid import calculate_frechet_distance, cross_modal_fid, make_inception_fn  # noqa: F401
from .generation import generate, sample_from_conditional, generate_from_conditional  # noqa: F401
from .gmm import GaussianMixtureSampler  # noqa: F401
