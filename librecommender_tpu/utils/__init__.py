from .misc import colorize, time_block
