from .rpc import RpcService, serve

__all__ = ["RpcService", "serve"]
