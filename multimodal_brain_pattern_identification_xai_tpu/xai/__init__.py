"""XAI stack — batched XLA attribution programs replacing the reference's
per-sample Python hooks (XAI_Multimodality.py §2242-3153):

* :mod:`.saliency` — vanilla gradient saliency (``generate_saliency_maps``)
* :mod:`.integrated_gradients` — Captum-style IG (imported but unused in
  the reference; live here), vmapped over the interpolation path
* :mod:`.expected_gradients` — SHAP ``GradientExplainer`` equivalent
  (expected gradients with background sampling)
* :mod:`.gradcam` — Grad-CAM via flax perturbations on sown feature maps
* :mod:`.lime` — LIME on spectrograms with a native SLIC segmenter and one
  batched masked-inference pass
* :mod:`.rollout` — attention rollout over sown attention weights
* :mod:`.channel_select` — SHAP-driven channel ranking + restructuring
"""

from .saliency import saliency_maps, multimodal_saliency  # noqa: F401
from .integrated_gradients import integrated_gradients  # noqa: F401
from .expected_gradients import (expected_gradients,  # noqa: F401
                                 gradient_shap_values)
from .gradcam import grad_cam  # noqa: F401
from .lime import (slic_segments, lime_explain, mark_boundaries,  # noqa: F401
                   plot_lime_overlay)
from .rollout import attention_rollout  # noqa: F401
from .channel_select import (get_top_n_channels,  # noqa: F401
                             restructure_to_top_channels,
                             retrain_on_top_channels)
from . import callbacks, channel_select, rollout, shap_plots, sharded  # noqa: F401
from .callbacks import LimeEpochSnapshot  # noqa: F401
from .sharded import (sharded_integrated_gradients,  # noqa: F401
                      sharded_expected_gradients,
                      sharded_gradient_shap_values)
from .shap_plots import (plot_mean_shap_values,  # noqa: F401
                         plot_mean_shap_values_scatter, plot_shap_summary)
