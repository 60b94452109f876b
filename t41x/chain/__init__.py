from t41x.chain.rx import (  # noqa: F401
    ChainSpec,
    ChannelParams,
    RxChain,
    RxState,
    default_params,
)
