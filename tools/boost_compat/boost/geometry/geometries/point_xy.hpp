#include "../../geometry.hpp"
