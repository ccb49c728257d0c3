from .model import GenerateCenter, generate_center_loss
from .hook import stability_delete_points

__all__ = ['GenerateCenter', 'generate_center_loss', 'stability_delete_points']
