from .easydict import EasyDict
from .registry import register, resolve, construct_class_by_name
