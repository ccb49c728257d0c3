from .pointrcnn_head import PointRCNNHead

__all__ = {
    'PointRCNNHead': PointRCNNHead,
}


def build_roi_head(name, **kwargs):
    return __all__[name](**kwargs)
