from t41x.demod.am import alpha_beta_mag, am_demod  # noqa: F401
from t41x.demod.nfm import nfm_demod, nfm_state  # noqa: F401
from t41x.demod.sam import SAMParams, SAMState, sam_demod, sam_params, sam_state  # noqa: F401
from t41x.demod.ssb import ssb_demod  # noqa: F401
