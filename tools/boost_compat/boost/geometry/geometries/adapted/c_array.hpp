#include "../../../geometry.hpp"
