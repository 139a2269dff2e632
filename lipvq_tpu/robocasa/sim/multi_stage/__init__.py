"""Multi-stage (composite) kitchen activities.

One module per activity group, mirroring reference
robocasa/environments/kitchen/multi_stage/ (20 activity directories,
82 task classes). Importing this package registers every task class in
REGISTERED_KITCHEN_ENVS via Kitchen.__init_subclass__.
"""

from lipvq_tpu.robocasa.sim.multi_stage.baking import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.boiling import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.brewing import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.chopping_food import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.clearing_table import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.defrosting_food import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.restocking_supplies import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.washing_dishes import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.frying import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.making_toast import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.meat_preparation import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.mixing_and_blending import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.reheating_food import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.sanitize_surface import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.serving_food import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.setting_the_table import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.snack_preparation import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.steaming_food import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.tidying_cabinets_and_drawers import *  # noqa: F401,F403
from lipvq_tpu.robocasa.sim.multi_stage.washing_fruits_and_vegetables import *  # noqa: F401,F403
