import faulthandler, os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(150, exit=True)
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
