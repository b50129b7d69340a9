from .labelmatch import LabelMatch, gmm_policy
from .pseudo_label import (
    PseudoLabels,
    create_pseudo_labels,
    create_pseudo_labels_multi,
)
from .quality import check_pseudo_label, check_pseudo_label_with_gt

__all__ = [
    "LabelMatch", "gmm_policy", "PseudoLabels", "create_pseudo_labels",
    "create_pseudo_labels_multi", "check_pseudo_label_with_gt",
    "check_pseudo_label",
]
