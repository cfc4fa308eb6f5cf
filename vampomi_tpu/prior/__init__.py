from .mixture import MixturePrior, g1, g1d, em_update, merge_components

__all__ = ["MixturePrior", "g1", "g1d", "em_update", "merge_components"]
