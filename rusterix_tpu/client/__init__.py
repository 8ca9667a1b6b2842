from .client import Client, ClientConfig
from .daylight import Daylight
from .draw2d import Draw2D
from .parser import MsgParser, Tok

__all__ = ["Client", "ClientConfig", "Daylight", "Draw2D", "MsgParser", "Tok"]
