from tracer.diff.fd import fd_gradient, compare_ad_fd

__all__ = ["fd_gradient", "compare_ad_fd"]
