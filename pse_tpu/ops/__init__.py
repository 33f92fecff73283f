from . import nearfield
from . import farfield
from . import noise
from . import lanczos
